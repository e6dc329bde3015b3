"""Pose-error metric engine.

Parity targets:
- `PoseErrorMeter` (ADD / ADD-S / ADD(-S) per-object distances, greedy
  best-error matching, AUC/threshold aggregation):
  /root/reference/happypose/pose_estimators/cosypose/cosypose/evaluation/
  meters/pose_meters.py:23-425
- greedy matcher `match_poses`: meters/utils.py:116-148
- `compute_auc_posecnn`: meters/utils.py:151-170 (YCB_Video_toolbox AUC)
- ModelNet meters (5deg/5cm etc.): megapose/evaluation/meters/
  modelnet_meters.py

Distances are computed on-device in fixed-shape batches (symmetry-aware
minima use the padded symmetry tensors); matching/aggregation runs host-side
on small arrays (counts ~ detections per image).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from happypose_tpu.lib3d.rotations import geodesic_distance
from happypose_tpu.lib3d.transforms import transform_pts
from happypose_tpu.meshes.database import BatchedMeshes


def compute_auc_posecnn(errors: np.ndarray) -> float:
    """PoseCNN-style AUC of the error-vs-recall curve up to 0.1 m.

    Exact re-derivation of the YCB_Video_toolbox procedure used by the
    reference (meters/utils.py:151-170)."""
    errors = np.asarray(errors, dtype=np.float64).copy()
    if errors.size == 0:
        return float("nan")
    d = np.sort(errors)
    d[d > 0.1] = np.inf
    accuracy = np.cumsum(np.ones(d.shape[0])) / d.shape[0]
    ids = np.isfinite(d)
    if ids.sum() == 0:
        return float("nan")
    rec = d[ids]
    prec = accuracy[ids]
    mrec = np.concatenate(([0], rec, [0.1]))
    mpre = np.concatenate(([0], prec, [prec[-1]]))
    for i in range(1, len(mpre)):
        mpre[i] = max(mpre[i], mpre[i - 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(((mrec[idx] - mrec[idx - 1]) * mpre[idx]).sum() * 10)


@jax.jit
def pose_errors_batch(
    TCO_pred: jax.Array,  # [N, 4, 4]
    TCO_gt: jax.Array,  # [N, 4, 4]
    points: jax.Array,  # [N, P, 3]
    points_mask: jax.Array,  # [N, P]
    symmetries: jax.Array,  # [N, S, 4, 4]
    sym_mask: jax.Array,  # [N, S]
) -> Dict[str, jax.Array]:
    """All per-pair error statistics in one device pass.

    Returns dict of [N] arrays: ADD, ADD-S, translation error, rotation
    error (deg), projected-extent-normalized values are computed by callers
    with diameters."""
    m = points_mask[..., None].astype(TCO_pred.dtype)
    denom = jnp.maximum(points_mask.sum(-1), 1)

    # ADD with symmetry-aware min over expanded GT poses
    TCO_gt_sym = jnp.einsum("nij,nsjk->nsik", TCO_gt, symmetries)
    gt_pts = transform_pts(TCO_gt_sym, points)  # [N, S, P, 3]
    pred_pts = transform_pts(TCO_pred, points)  # [N, P, 3]
    d = jnp.linalg.norm((gt_pts - pred_pts[:, None]) * m[:, None], axis=-1)
    add_per_sym = d.sum(-1) / denom[:, None]  # [N, S]
    add_per_sym = jnp.where(sym_mask, add_per_sym, jnp.inf)
    add = jnp.min(add_per_sym, axis=-1)

    # ADD-S (nearest-neighbor symmetric distance, identity-gt only)
    gt0 = transform_pts(TCO_gt, points)
    d2 = jnp.sum(
        (gt0[:, :, None, :] - pred_pts[:, None, :, :]) ** 2, axis=-1
    )  # [N, Pgt, Ppred]
    big = jnp.asarray(jnp.inf, d2.dtype)
    d2 = jnp.where(points_mask[:, :, None] & points_mask[:, None, :], d2, big)
    nn = jnp.sqrt(jnp.min(d2, axis=1))  # [N, Ppred] nearest gt per pred point
    adds = jnp.sum(jnp.where(points_mask, nn, 0.0), axis=-1) / denom

    trans_err = jnp.linalg.norm(
        TCO_pred[:, :3, 3] - TCO_gt[:, :3, 3], axis=-1
    )
    rot_err_deg = geodesic_distance(
        TCO_pred[:, :3, :3], TCO_gt[:, :3, :3]
    ) * (180.0 / jnp.pi)
    return {
        "ADD": add,
        "ADD-S": adds,
        "trans_err": trans_err,
        "rot_err_deg": rot_err_deg,
    }


def match_poses(
    pred_keys: np.ndarray,  # [Np, K] int group keys (e.g. scene, view, label)
    gt_keys: np.ndarray,  # [Ng, K]
    pred_scores: np.ndarray,  # [Np]
    errors: np.ndarray,  # [Np, Ng] pairwise errors (inf where not same group)
) -> List[tuple]:
    """Greedy 1-1 matching, best-scored prediction first, lowest error GT.

    Parity: meters/utils.py:116-148. Returns list of (pred_idx, gt_idx)."""
    matches = []
    gt_used = np.zeros(len(gt_keys), bool)
    order = np.argsort(-pred_scores)
    for pi in order:
        cand = np.where(
            (gt_keys == pred_keys[pi]).all(axis=1) & ~gt_used
        )[0]
        if len(cand) == 0:
            continue
        best = cand[np.argmin(errors[pi, cand])]
        if not np.isfinite(errors[pi, best]):
            continue
        gt_used[best] = True
        matches.append((int(pi), int(best)))
    return matches


@dataclass
class PoseErrorMeter:
    """Accumulates matched pose errors and reports summary statistics.

    Usage: `add(...)` per image batch with predictions + GT (already
    matched or matchable by (batch_im_id, obj_id, instance)); `summary()`
    reports AUC of ADD(-S), <0.1d recalls, mean errors.
    """

    meshes: BatchedMeshes
    spheres_overlap_check: bool = True
    errors: Dict[str, List[np.ndarray]] = field(default_factory=dict)
    n_gt_total: int = 0
    is_symmetric: Optional[np.ndarray] = None  # [n_obj] use ADD-S for these

    def add(
        self,
        TCO_pred: np.ndarray,  # [Np, 4, 4]
        pred_obj_ids: np.ndarray,
        pred_scores: np.ndarray,
        pred_group: np.ndarray,  # [Np] image/scene group id
        TCO_gt: np.ndarray,  # [Ng, 4, 4]
        gt_obj_ids: np.ndarray,
        gt_group: np.ndarray,
    ) -> None:
        """Match predictions to GT and accumulate errors."""
        self.n_gt_total += len(TCO_gt)
        if len(TCO_pred) == 0 or len(TCO_gt) == 0:
            return
        # pairwise center distance as matching error (spheres-overlap prune)
        pc = TCO_pred[:, :3, 3]
        gc = TCO_gt[:, :3, 3]
        dist = np.linalg.norm(pc[:, None] - gc[None, :], axis=-1)
        diam = np.asarray(self.meshes.diameters)
        if self.spheres_overlap_check:
            rad = diam[np.asarray(gt_obj_ids)] / 2 + diam[np.asarray(pred_obj_ids)][:, None] / 2
            dist = np.where(dist <= rad, dist, np.inf)
        pred_keys = np.stack([pred_group, pred_obj_ids], axis=1)
        gt_keys = np.stack([gt_group, gt_obj_ids], axis=1)
        matches = match_poses(pred_keys, gt_keys, pred_scores, dist)
        if not matches:
            return
        pi = np.asarray([m[0] for m in matches])
        gi = np.asarray([m[1] for m in matches])
        inst = self.meshes.select(jnp.asarray(gt_obj_ids[gi], jnp.int32))
        errs = jax.device_get(
            pose_errors_batch(
                jnp.asarray(TCO_pred[pi]),
                jnp.asarray(TCO_gt[gi]),
                inst.points,
                inst.points_mask,
                inst.symmetries,
                inst.symmetries_mask,
            )
        )
        errs["obj_id"] = gt_obj_ids[gi]
        errs["diameter"] = diam[gt_obj_ids[gi]]
        for k, v in errs.items():
            self.errors.setdefault(k, []).append(np.asarray(v))

    def summary(self) -> Dict[str, float]:
        if not self.errors:
            return {"n_matched": 0, "n_gt": self.n_gt_total}
        E = {k: np.concatenate(v) for k, v in self.errors.items()}
        n = len(E["ADD"])
        obj_ids = E["obj_id"].astype(int)
        if self.is_symmetric is not None:
            use_adds = np.asarray(self.is_symmetric)[obj_ids]
        else:
            use_adds = np.zeros(n, bool)
        add_of_s = np.where(use_adds, E["ADD-S"], E["ADD"])

        # unmatched GTs count as infinite error in recall-style metrics
        miss = self.n_gt_total - n
        padded = np.concatenate([add_of_s, np.full(miss, np.inf)])
        out = {
            "n_matched": n,
            "n_gt": self.n_gt_total,
            "AUC/ADD(-S)": compute_auc_posecnn(padded),
            "AUC/ADD-S": compute_auc_posecnn(
                np.concatenate([E["ADD-S"], np.full(miss, np.inf)])
            ),
            "ADD(-S)<0.1d": float(
                (padded < np.concatenate(
                    [E["diameter"] * 0.1, np.full(miss, -1.0)]
                )).mean()
            ),
            "mean_ADD": float(E["ADD"].mean()),
            "mean_ADD-S": float(E["ADD-S"].mean()),
            "mean_trans_err": float(E["trans_err"].mean()),
            "mean_rot_err_deg": float(E["rot_err_deg"].mean()),
            # ModelNet-style novel-object metrics (modelnet_meters.py)
            "5deg_5cm": float(
                ((E["rot_err_deg"] < 5.0) & (E["trans_err"] < 0.05)).sum()
                / max(self.n_gt_total, 1)
            ),
            "ADD<0.1d": float(
                (E["ADD"] < 0.1 * E["diameter"]).sum() / max(self.n_gt_total, 1)
            ),
        }
        return out
