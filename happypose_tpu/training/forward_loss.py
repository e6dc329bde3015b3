"""Forward+loss builders for refiner and coarse-classifier training.

Parity targets: /root/reference/happypose/pose_estimators/megapose/training/
megapose_forward_loss.py (hypothesis generation :46-141, per-iteration
disentangled loss :168-241) and cosypose/training/pose_forward_loss.py.

Everything (noise sampling, multiview negative sampling, rendering, loss)
runs inside the jitted step — the reference's numpy hypothesis sampling is
replaced by jax.random so the whole step is device-resident.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.multiview_geom import make_TCO_multiview
from happypose_tpu.lib3d.transforms import add_pose_noise
from happypose_tpu.meshes.database import BatchedMeshes, RenderAssets
from happypose_tpu.models.pose_predictor import PosePredictor
from happypose_tpu.training.losses import (
    coarse_classification_loss,
    loss_refiner_CO_disentangled_reference_point,
)


class PoseTrainingBatch(NamedTuple):
    """One training batch (all fixed-shape device arrays)."""

    images: jax.Array  # [B, 3(+1), H, W]
    K: jax.Array  # [B, 3, 3]
    obj_ids: jax.Array  # [B] int32
    TCO_gt: jax.Array  # [B, 4, 4]


def make_refiner_loss_fn(
    model: PosePredictor,
    assets: RenderAssets,
    meshes: BatchedMeshes,
    n_iterations: int = 3,
    euler_deg_std=(15.0, 15.0, 15.0),
    trans_std=(0.01, 0.01, 0.05),
):
    """Refiner training: input = gt + SE(3) noise ("gt+noise" generator,
    train_pose.py:263), loss = disentangled reference-point loss summed over
    iterations."""

    def loss_fn(variables, batch: PoseTrainingBatch, rng):
        inst = meshes.select(batch.obj_ids)
        TCO_input = add_pose_noise(
            rng, batch.TCO_gt, euler_deg_std=euler_deg_std, trans_std=trans_std
        )
        out, new_state = model.apply(
            variables,
            batch.images,
            batch.K,
            batch.obj_ids,
            TCO_input,
            assets,
            inst,
            n_iterations=n_iterations,
            train=True,
            mutable=["batch_stats"],
        )
        TCO_possible_gt = jnp.einsum(
            "bij,bsjk->bsik", batch.TCO_gt, inst.symmetries
        )
        total = 0.0
        metrics: Dict[str, jax.Array] = {}
        for it in range(n_iterations):
            l, parts = loss_refiner_CO_disentangled_reference_point(
                TCO_possible_gt=TCO_possible_gt,
                TCO_input=out.TCO_input[it],
                refiner_outputs=out.pose_raw[it],
                K_crop=out.K_crop[it],
                points=inst.points,
                tCR=out.tCR[it],
                points_mask=inst.points_mask,
                sym_mask=inst.symmetries_mask,
            )
            total = total + jnp.mean(l)
            metrics[f"loss_TCO_iter{it + 1}"] = jnp.mean(l)
            metrics[f"loss_orn_iter{it + 1}"] = jnp.mean(parts["loss_orn"])
        total = total / n_iterations
        return total, (metrics, new_state["batch_stats"])

    return loss_fn


def make_coarse_loss_fn(
    model: PosePredictor,
    assets: RenderAssets,
    meshes: BatchedMeshes,
    n_hypotheses: int = 2,
    positive_inclusion_prob: float = 0.7,
    euler_deg_std=(15.0, 15.0, 15.0),
    trans_std=(0.01, 0.01, 0.05),
    logits_temperature: float = 1.0,
):
    """Coarse-classifier training ("coarse_classif_multiview_paper",
    megapose_forward_loss.py:104-141): negatives are renders of the noised
    gt pose seen from the 26-sphere x 4-inplane viewpoints; the positive
    (view 0) is included in the sampled hypothesis set with probability
    `positive_inclusion_prob` when not drawn naturally."""

    def loss_fn(variables, batch: PoseTrainingBatch, rng):
        B = batch.TCO_gt.shape[0]
        k_noise, k_perm, k_inc, k_slot = jax.random.split(rng, 4)
        TCO_noise = add_pose_noise(
            k_noise, batch.TCO_gt, euler_deg_std=euler_deg_std,
            trans_std=trans_std,
        )
        tCR = TCO_noise[:, :3, 3]
        TCV_O = make_TCO_multiview(
            TCO_noise, tCR, multiview_type="sphere_26views",
            remove_TCO_rendering=True, views_inplane_rotations=True,
        )  # [B, 104, 4, 4]
        n_views = TCV_O.shape[1]

        # sample n_hypotheses distinct views per sample
        perm = jax.vmap(
            lambda k: jax.random.permutation(k, n_views)[:n_hypotheses]
        )(jax.random.split(k_perm, B))  # [B, n_hyp]
        # forced positive inclusion
        include = jax.random.uniform(k_inc, (B,)) < positive_inclusion_prob
        slot = jax.random.randint(k_slot, (B,), 0, n_hypotheses)
        has_pos = jnp.any(perm == 0, axis=1)
        do_force = include & ~has_pos
        perm = jnp.where(
            do_force[:, None]
            & (jnp.arange(n_hypotheses)[None, :] == slot[:, None]),
            0,
            perm,
        )
        is_positive = (perm == 0).astype(jnp.float32)  # [B, n_hyp]

        hyp_TCO = jnp.take_along_axis(
            TCV_O, perm[:, :, None, None], axis=1
        ).reshape(B * n_hypotheses, 4, 4)
        rep = lambda x: jnp.repeat(x, n_hypotheses, axis=0)
        inst = meshes.select(rep(batch.obj_ids))
        out, new_state = model.apply(
            variables,
            rep(batch.images),
            rep(batch.K),
            rep(batch.obj_ids),
            hyp_TCO,
            assets,
            inst,
            n_iterations=1,
            train=True,
            mutable=["batch_stats"],
        )
        logits = out.renderings_logits[0, :, 0].reshape(B, n_hypotheses)
        logits = logits / logits_temperature
        loss = coarse_classification_loss(logits, is_positive)
        acc = jnp.mean(((logits > 0) == (is_positive > 0.5)).astype(jnp.float32))
        return loss, ({"coarse_acc": acc}, new_state["batch_stats"])

    return loss_fn


def sample_grid_hypotheses(
    rng: jax.Array,
    TCO_gt: jax.Array,  # [B, 4, 4]
    symmetries: jax.Array,  # [B, S, 4, 4]
    symmetries_mask: jax.Array,  # [B, S]
    grid_R: jax.Array,  # [M, 3, 3]
    n_hypotheses: int,
    euler_deg_std=(15.0, 15.0, 15.0),
    trans_std=(0.01, 0.01, 0.05),
    rot_label_thresh_deg: float = 30.0,
):
    """Grid-negative hypothesis sampling for coarse-classifier training.

    Slot 0 = noised gt; the rest are random SO(3)-grid rotations sharing
    slot 0's translation — every hypothesis differs ONLY in rotation, so
    the classifier cannot exploit translation-geometry shortcuts. Labels
    are `angle_sym(R_hyp, R_gt) < rot_label_thresh_deg` where the angle is
    the symmetry-aware geodesic distance.

    Returns (hyp_TCO [B, n, 4, 4], labels [B, n] float, ang [B, n] rad).
    """
    from happypose_tpu.lib3d.transforms import make_T

    B = TCO_gt.shape[0]
    M = grid_R.shape[0]
    k_noise, k_grid = jax.random.split(rng)
    TCO_noise = add_pose_noise(
        k_noise, TCO_gt, euler_deg_std=euler_deg_std, trans_std=trans_std
    )
    gidx = jax.random.randint(k_grid, (B, n_hypotheses - 1), 0, M)
    R_neg = grid_R[gidx]  # [B, n-1, 3, 3]
    t_shared = jnp.broadcast_to(
        TCO_noise[:, None, :3, 3], (B, n_hypotheses - 1, 3)
    )
    T_neg = make_T(
        R_neg.reshape(-1, 3, 3), t_shared.reshape(-1, 3),
        dtype=TCO_noise.dtype,
    ).reshape(B, n_hypotheses - 1, 4, 4)
    hyp_TCO = jnp.concatenate([TCO_noise[:, None], T_neg], axis=1)

    R_eq = jnp.einsum(
        "bij,bsjk->bsik", TCO_gt[:, :3, :3], symmetries[..., :3, :3]
    )  # [B, S, 3, 3]
    tr = jnp.einsum("bnji,bsji->bns", hyp_TCO[:, :, :3, :3], R_eq)
    ang = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    ang = jnp.min(
        jnp.where(symmetries_mask[:, None, :], ang, jnp.inf), axis=-1
    )  # [B, n] radians
    labels = (ang < jnp.deg2rad(rot_label_thresh_deg)).astype(jnp.float32)
    return hyp_TCO, labels, ang


def make_coarse_grid_loss_fn(
    model: PosePredictor,
    assets: RenderAssets,
    meshes: BatchedMeshes,
    n_hypotheses: int = 8,
    euler_deg_std=(15.0, 15.0, 15.0),
    trans_std=(0.01, 0.01, 0.05),
    rot_label_thresh_deg: float = 30.0,
    so3_grid_size: int = 576,
):
    """Coarse training against GRID-rotation negatives — the task the
    inference pipeline actually runs (score detection x SO(3)-grid
    hypotheses, pose_estimator.py:327-485).

    Round-5 diagnosis: the reference-style multiview protocol
    (`make_coarse_loss_fn`) lets the classifier exploit a translation-
    geometry shortcut — sphere-view negatives place the object on-axis at
    distance r while the positive keeps the original off-axis translation
    — so a model with 0.77 in-training accuracy ranked the 576-grid at
    CHANCE held-out (artifacts/COARSE_EVAL_r05.json). Here every
    hypothesis shares the SAME noised translation and differs only in
    rotation (slot 0 = noised gt, the rest random grid rotations), and
    labels come from the symmetry-aware geodesic angle to gt
    (< `rot_label_thresh_deg`), which is exactly the recall criterion the
    pipeline needs the scorer to optimize.
    """
    from happypose_tpu.lib3d.so3_grid import load_SO3_grid

    grid_R = jnp.asarray(load_SO3_grid(so3_grid_size))  # [M, 3, 3]

    def loss_fn(variables, batch: PoseTrainingBatch, rng):
        B = batch.TCO_gt.shape[0]
        n_hyp = n_hypotheses
        inst0 = meshes.select(batch.obj_ids)
        hyp_TCO, labels, ang = sample_grid_hypotheses(
            rng, batch.TCO_gt, inst0.symmetries, inst0.symmetries_mask,
            grid_R, n_hyp, euler_deg_std=euler_deg_std, trans_std=trans_std,
            rot_label_thresh_deg=rot_label_thresh_deg,
        )

        flat = hyp_TCO.reshape(B * n_hyp, 4, 4)
        rep = lambda x: jnp.repeat(x, n_hyp, axis=0)
        inst = meshes.select(rep(batch.obj_ids))
        out, new_state = model.apply(
            variables,
            rep(batch.images),
            rep(batch.K),
            rep(batch.obj_ids),
            flat,
            assets,
            inst,
            n_iterations=1,
            train=True,
            mutable=["batch_stats"],
        )
        logits = out.renderings_logits[0, :, 0].reshape(B, n_hyp)
        loss = coarse_classification_loss(logits, labels)
        acc = jnp.mean(((logits > 0) == (labels > 0.5)).astype(jnp.float32))
        # the metric the pipeline cares about: does the best-scored
        # hypothesis lie within the threshold?
        top1 = jnp.take_along_axis(
            ang, jnp.argmax(logits, axis=1)[:, None], axis=1
        )[:, 0]
        top1_ok = jnp.mean(
            (top1 < jnp.deg2rad(rot_label_thresh_deg)).astype(jnp.float32)
        )
        return loss, (
            {"coarse_acc": acc, "coarse_top1_within_thresh": top1_ok},
            new_state["batch_stats"],
        )

    return loss_fn
