"""Multi-view scene-reconstruction evaluation.

Parity target: the multiview half of /root/reference/happypose/
pose_estimators/cosypose/cosypose/scripts/run_cosypose_eval.py:306-580 and
`MultiviewPredictionRunner` — group frames of a scene into view sets, run
single-view estimation per view, fuse with RANSAC + bundle adjustment, and
report per-view pose errors before/after fusion.

Works on any BOP split whose scenes have multiple views with world-frame
camera poses (`cam_R_w2c`); `--synthesize` first records such a dataset
with the on-chip renderer.

Usage:
  python -m happypose_tpu.scripts.run_multiview_eval \
      --out-dir /tmp/mv --synthesize --n-views 4
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from happypose_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def synthesize_multiview_scene(out_dir: Path, n_views: int, seed: int = 0):
    """Record a BOP scene with n_views cameras around 3 world objects."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as ScipyRot

    from happypose_tpu.datasets.bop import SceneObservation, write_bop_scene
    from happypose_tpu.meshes.database import MeshDataBase
    from happypose_tpu.meshes.io import (
        make_box_mesh, make_uv_sphere, position_colored, save_ply,
    )
    from happypose_tpu.ops.scene_renderer import render_scenes

    rng = np.random.RandomState(seed)
    models = out_dir / "models"
    models.mkdir(parents=True, exist_ok=True)
    meshes_mm = {
        1: position_colored(make_uv_sphere(40.0, 16, 24)),
        2: position_colored(make_box_mesh((35.0, 25.0, 45.0))),
        3: position_colored(make_box_mesh((50.0, 20.0, 30.0))),
    }
    for oid, m in meshes_mm.items():
        save_ply(models / f"obj_{oid:06d}.ply", m)
    (models / "models_info.json").write_text(json.dumps(
        {str(i): {"diameter": float(m.diameter)} for i, m in meshes_mm.items()}
    ))

    db = MeshDataBase(meshes={
        f"obj_{i:06d}": m.scaled(0.001) for i, m in meshes_mm.items()
    })
    assets = db.render_assets()
    H, W = 240, 320
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 400.0
    K[0, 2], K[1, 2] = W / 2, H / 2

    n_obj = 3
    TWO = np.tile(np.eye(4, dtype=np.float32), (n_obj, 1, 1))
    TWO[:, :3, :3] = ScipyRot.random(n_obj, random_state=seed).as_matrix()
    TWO[:, :3, 3] = rng.uniform(-0.08, 0.08, (n_obj, 3))
    # cameras on an arc, each aimed at the world origin (look-at)
    from happypose_tpu.lib3d.multiview_geom import look_at_R

    TWC = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
    for v in range(n_views):
        ang = 0.25 * (v - (n_views - 1) / 2)
        pos = np.asarray(
            [0.55 * np.sin(ang), 0.0, -0.55 * np.cos(ang)], np.float32
        )
        R = np.asarray(look_at_R(
            jnp.asarray(pos)[None], jnp.zeros((1, 3)),
            jnp.asarray([[0.0, -1.0, 0.0]]),
        ))[0]
        TWC[v, :3, :3] = R
        TWC[v, :3, 3] = pos

    frames = []
    for v in range(n_views):
        TCO = np.einsum(
            "ij,ojk->oik", np.linalg.inv(TWC[v]), TWO
        ).astype(np.float32)
        out = render_scenes(
            assets,
            jnp.arange(n_obj, dtype=jnp.int32),
            jnp.zeros(n_obj, jnp.int32),
            jnp.asarray(TCO),
            jnp.asarray(np.tile(K[None], (n_obj, 1, 1))),
            jnp.ones(n_obj, bool),
            n_scenes=1,
            resolution=(H, W),
        )
        mask = np.asarray(out.mask[0])
        labels, TCOs, bboxes = [], [], []
        for o in range(n_obj):
            solo = render_scenes(
                assets, jnp.asarray([o], jnp.int32), jnp.zeros(1, jnp.int32),
                jnp.asarray(TCO[o : o + 1]), jnp.asarray(K[None]),
                jnp.ones(1, bool), n_scenes=1, resolution=(H, W),
            )
            m = np.asarray(solo.mask[0]) & (
                np.abs(np.asarray(solo.depth[0]) - np.asarray(out.depth[0]))
                < 1e-4
            )
            if m.sum() < 32:
                continue
            ys, xs = np.where(m)
            labels.append(db.labels[o])
            TCOs.append(TCO[o])
            bboxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
        frames.append(SceneObservation(
            rgb=(np.asarray(out.rgb[0]) * 255).astype(np.uint8),
            K=K, TWC=TWC[v], obj_labels=labels, TWO=np.stack(TCOs),
            bboxes=np.asarray(bboxes, np.float32),
            visib_fract=np.ones(len(labels), np.float32),
            scene_id=0, view_id=v,
        ))
    write_bop_scene(out_dir / "scenes", 0, frames)
    return out_dir


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", type=Path, required=True)
    p.add_argument("--synthesize", action="store_true")
    p.add_argument("--n-views", type=int, default=4)
    p.add_argument("--candidate-noise-deg", type=float, default=1.0)
    p.add_argument("--candidate-noise-t", type=float, default=0.003)
    p.add_argument("--known-cameras", action="store_true")
    p.add_argument("--ba-solver", choices=["dense", "schur"],
                   default="dense",
                   help="bundle-adjustment solver (schur = block "
                        "elimination, scales to large scenes)")
    args = p.parse_args(argv)

    from scipy.spatial.transform import Rotation as ScipyRot

    from happypose_tpu.datasets.bop import BOPObjectDataset, BOPSceneDataset
    from happypose_tpu.multiview import MultiviewCandidates
    from happypose_tpu.multiview.scene_predictor import MultiviewScenePredictor

    if args.synthesize:
        synthesize_multiview_scene(args.out_dir, args.n_views)

    obj_ds = BOPObjectDataset(args.out_dir / "models")
    scene_ds = BOPSceneDataset(args.out_dir / "scenes")
    bm = obj_ds.mesh_db.batched(n_points=128)
    rng = np.random.RandomState(1)

    # single-view candidates: gt + noise stands in for the per-view pipeline
    # (swap in PoseEstimator predictions for full end-to-end runs)
    poses, view_ids, obj_ids, gt_poses = [], [], [], {}
    K_per_view, TWC_gt = [], []
    for idx in range(len(scene_ds)):
        obs = scene_ds[idx]
        K_per_view.append(obs.K)
        TWC_gt.append(obs.TWC)
        for j, label in enumerate(obs.obj_labels):
            noise = np.eye(4)
            noise[:3, :3] = ScipyRot.from_rotvec(
                rng.normal(0, np.deg2rad(args.candidate_noise_deg), 3)
            ).as_matrix()
            noise[:3, 3] = rng.normal(0, args.candidate_noise_t, 3)
            poses.append(obs.TWO[j] @ noise)
            view_ids.append(obs.view_id)
            obj_ids.append(obj_ds.mesh_db.id_of(label))
            gt_poses[(obs.view_id, obj_ids[-1])] = obs.TWO[j]
    cands = MultiviewCandidates(
        poses=np.asarray(poses, np.float32),
        view_ids=np.asarray(view_ids),
        obj_ids=np.asarray(obj_ids),
        scores=np.ones(len(poses), np.float32),
    )

    predictor = MultiviewScenePredictor(
        bm, score_th=0.0, n_ransac_iter=30, dist_threshold=0.02,
        n_min_inliers=2, ba_solver=args.ba_solver,
    )
    state = predictor.predict_scene_state(
        cands, np.stack(K_per_view),
        known_TWC=np.stack(TWC_gt) if args.known_cameras else None,
    )
    if state is None:
        logger.info("no scene reconstructed")
        return 1

    errs_before, errs_after = [], []
    per_view = state.predictions_per_view()
    for v, pred in per_view.items():
        for o in range(len(pred["obj_ids"])):
            key = (v, int(pred["obj_ids"][o]))
            if key not in gt_poses:
                continue
            gt = gt_poses[key]
            errs_after.append(
                np.linalg.norm(pred["TCO"][o][:3, 3] - gt[:3, 3])
            )
    for i in range(len(cands)):
        gt = gt_poses.get((int(cands.view_ids[i]), int(cands.obj_ids[i])))
        if gt is not None:
            errs_before.append(
                np.linalg.norm(cands.poses[i][:3, 3] - gt[:3, 3])
            )
    summary = {
        "n_objects": int(state.TWO.shape[0]),
        "n_views": int(len(per_view)),
        "ba_loss": float(state.ba_loss),
        "mean_trans_err_candidates": float(np.mean(errs_before)),
        "mean_trans_err_fused": float(np.mean(errs_after)),
    }
    logger.info(json.dumps(summary, indent=1))
    (args.out_dir / "multiview_summary.json").write_text(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
