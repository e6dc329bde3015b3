"""Record a synthetic multi-object BOP-format dataset with the on-chip
renderer.

Parity target: the reference's synthetic data generation — pybullet
`BopRecordingScene` (cosypose/recording/bop_recording_scene.py:26-271) and
the BlenderProc PBR pipeline (megapose/scripts/generate_shapenet_pbr.py) —
re-imagined without external engines: scenes are sampled with jax.random,
rendered (multi-object z-composite, randomized lighting/background), and
written in BOP layout so every downstream loader works unchanged.

Usage:
  python -m happypose_tpu.scripts.record_synthetic_dataset \
      --models-dir <bop>/models --out-dir /tmp/synth --n-frames 50
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from happypose_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--models-dir", type=Path, default=None,
                   help="BOP models dir; defaults to built-in debug meshes")
    p.add_argument("--out-dir", type=Path, required=True)
    p.add_argument("--n-frames", type=int, default=20)
    p.add_argument("--n-objects-per-scene", type=int, default=3)
    p.add_argument("--resolution", type=int, nargs=2, default=(240, 320))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--write-models", action="store_true",
                   help="also write <out-dir>/models in BOP layout")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from happypose_tpu.datasets.bop import SceneObservation, write_bop_scene
    from happypose_tpu.meshes.database import MeshDataBase
    from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
    from happypose_tpu.lib3d.so3_grid import quats_to_rotmats
    from happypose_tpu.ops.scene_renderer import render_scenes

    if args.models_dir:
        from happypose_tpu.datasets.bop import BOPObjectDataset

        mesh_db = BOPObjectDataset(args.models_dir).mesh_db
    else:
        mesh_db = MeshDataBase(meshes={
            "obj_000001": make_uv_sphere(0.04, 16, 24),
            "obj_000002": make_box_mesh((0.035, 0.025, 0.045)),
        })
    assets = mesh_db.render_assets()
    n_labels = len(mesh_db.labels)
    H, W = args.resolution
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 1.6 * W
    K[0, 2], K[1, 2] = W / 2, H / 2
    on_tpu = jax.default_backend() not in ("cpu",)
    rng = np.random.RandomState(args.seed)

    frames = []
    N = args.n_objects_per_scene
    for v in range(args.n_frames):
        ids = rng.randint(0, n_labels, N)
        q = rng.randn(N, 4)
        R = quats_to_rotmats(q)
        TCO = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
        TCO[:, :3, :3] = R
        TCO[:, 0, 3] = rng.uniform(-0.08, 0.08, N)
        TCO[:, 1, 3] = rng.uniform(-0.06, 0.06, N)
        TCO[:, 2, 3] = rng.uniform(0.4, 0.7, N)
        out = render_scenes(
            assets,
            jnp.asarray(ids, jnp.int32),
            jnp.zeros(N, jnp.int32),
            jnp.asarray(TCO),
            jnp.asarray(np.tile(K[None], (N, 1, 1))),
            jnp.ones(N, bool),
            n_scenes=1,
            resolution=(H, W),
            renderer="pallas" if on_tpu else "reference",
        )
        rgb = np.asarray(out.rgb[0])
        mask = np.asarray(out.mask[0])
        # randomized smooth background
        bg = rng.rand(H // 8, W // 8, 3).astype(np.float32)
        from PIL import Image

        bg = np.asarray(
            Image.fromarray((bg * 255).astype(np.uint8)).resize((W, H))
        ).astype(np.float32) / 255.0
        rgb = np.where(mask[..., None], rgb, bg)

        labels, TWOs, bboxes, visib = [], [], [], []
        depth_full = np.asarray(out.depth[0])
        for j in range(N):
            # per-instance visibility from a solo render
            solo = render_scenes(
                assets, jnp.asarray(ids[j : j + 1], jnp.int32),
                jnp.zeros(1, jnp.int32), jnp.asarray(TCO[j : j + 1]),
                jnp.asarray(K[None]), jnp.ones(1, bool), n_scenes=1,
                resolution=(H, W),
                renderer="pallas" if on_tpu else "reference",
            )
            m_solo = np.asarray(solo.mask[0])
            m_visib = m_solo & (
                np.abs(np.asarray(solo.depth[0]) - depth_full) < 1e-4
            )
            if m_visib.sum() < 16:
                continue
            ys, xs = np.where(m_visib)
            labels.append(mesh_db.labels[ids[j]])
            TWOs.append(TCO[j])
            bboxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
            visib.append(m_visib.sum() / max(m_solo.sum(), 1))
        if not labels:
            continue
        frames.append(
            SceneObservation(
                rgb=(np.clip(rgb, 0, 1) * 255).astype(np.uint8),
                K=K,
                depth=depth_full,
                obj_labels=labels,
                TWO=np.stack(TWOs),
                bboxes=np.asarray(bboxes, np.float32),
                visib_fract=np.asarray(visib, np.float32),
                scene_id=0,
                view_id=v,
            )
        )
    write_bop_scene(args.out_dir, 0, frames)
    if args.write_models:
        from happypose_tpu.datasets.bop import write_bop_models

        write_bop_models(args.out_dir / "models", mesh_db)
    logger.info(f"wrote {len(frames)} frames to {args.out_dir}/000000")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
