"""Record a synthetic multi-object BOP-format dataset with the on-chip
renderer and the domain-randomized scene engine.

Parity target: the reference's synthetic data generation — pybullet
`BopRecordingScene` (cosypose/recording/bop_recording_scene.py:26-271) and
the BlenderProc PBR pipeline (megapose/scripts/generate_shapenet_pbr.py) —
re-imagined without external engines: `SceneSynthesizer` samples resting
poses (projected-gravity solver), spherical cameras, randomized
lights/backgrounds (domain randomization); frames render as multi-object
z-composites and are written in BOP layout so every downstream loader
works unchanged. Occlusion-aware visib_fract comes from solo-vs-composite
depth; frames failing the border check are resampled.

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
    p.add_argument("--n-objects-interval", type=int, nargs=2, default=(2, 4))
    p.add_argument("--proba-falling", type=float, default=0.5)
    p.add_argument("--resolution", type=int, nargs=2, default=(240, 320))
    p.add_argument("--no-domain-rand", action="store_true")
    p.add_argument("--no-border-check", action="store_true")
    p.add_argument("--textures-on-objects", action="store_true",
                   help="give every object a procedural texture "
                        "(ref: textures_on_objects)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--write-models", action="store_true",
                   help="also write <out-dir>/models in BOP layout")
    p.add_argument("--wds", action="store_true",
                   help="also write <out-dir>/wds tar shards (the training "
                        "pipeline's streaming format, ref WebSceneDataset)")
    p.add_argument("--shard-size", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from happypose_tpu.datasets.bop import SceneObservation, write_bop_scene
    from happypose_tpu.datasets.scene_synth import (
        SceneSynthConfig, SceneSynthesizer,
    )
    from happypose_tpu.meshes.database import MeshDataBase
    from happypose_tpu.meshes.io import (
        make_box_mesh, make_procedural_texture, make_uv_sphere,
    )
    from happypose_tpu.ops.scene_renderer import render_scenes

    if args.models_dir:
        from happypose_tpu.datasets.bop import BOPObjectDataset

        mesh_db = BOPObjectDataset(args.models_dir).mesh_db
    else:
        mesh_db = MeshDataBase(meshes={
            # dense enough that baked vertex colors (write_bop_models)
            # retain texture detail
            "obj_000001": make_uv_sphere(0.04, 24, 32, with_uv=True),
            "obj_000002": make_box_mesh((0.035, 0.025, 0.045)),
        })
    if args.textures_on_objects:
        for k, label in enumerate(mesh_db.labels):
            m = mesh_db.meshes[label]
            if m.vertex_uv is not None:
                m.texture = make_procedural_texture(128, seed=args.seed + k)
    assets = mesh_db.render_assets()
    H, W = args.resolution
    on_tpu = jax.default_backend() not in ("cpu",)
    renderer = "pallas" if on_tpu else "reference"

    cfg = SceneSynthConfig(
        n_objects_interval=tuple(args.n_objects_interval),
        proba_falling=args.proba_falling,
        resolution=(H, W),
        border_check=not args.no_border_check,
        domain_randomization=not args.no_domain_rand,
    )
    synth = SceneSynthesizer(mesh_db, cfg, seed=args.seed)

    def render_frame(scene):
        """Returns (SceneObservation or None if border check fails)."""
        N = len(scene.obj_ids)
        TCO = scene.TCO
        Kb = jnp.asarray(np.tile(scene.K[None], (N, 1, 1)))
        lights = jnp.asarray(np.tile(scene.light[None], (N, 1)))
        out = render_scenes(
            assets, jnp.asarray(scene.obj_ids), jnp.zeros(N, jnp.int32),
            jnp.asarray(TCO), Kb, jnp.ones(N, bool), n_scenes=1,
            resolution=(H, W), renderer=renderer, lights=lights,
        )
        rgb = np.asarray(out.rgb[0])
        mask = np.asarray(out.mask[0])
        depth_full = np.asarray(out.depth[0])

        # solo renders: occlusion-aware visibility + per-instance masks
        solo = render_scenes(
            assets, jnp.asarray(scene.obj_ids),
            jnp.arange(N, dtype=jnp.int32), jnp.asarray(TCO), Kb,
            jnp.ones(N, bool), n_scenes=N, resolution=(H, W),
            renderer=renderer,
        )
        labels, TWOs, bboxes, visib = [], [], [], []
        for j in range(N):
            m_solo = np.asarray(solo.mask[j])
            m_visib = m_solo & (
                np.abs(np.asarray(solo.depth[j]) - depth_full) < 1e-4
            )
            if m_visib.sum() == 0:
                continue  # zero pixels in frame: nothing to annotate
            ys, xs = np.where(m_visib)
            if cfg.border_check and (
                ys.min() == 0 or xs.min() == 0
                or ys.max() == H - 1 or xs.max() == W - 1
            ):
                return None  # resample the whole frame (ref :185-205)
            # every rendered pixel gets an annotation — even tiny
            # mostly-occluded instances (true visib_fract recorded;
            # downstream visibility filters decide, ref visib>=0.05/0.1)
            labels.append(mesh_db.labels[scene.obj_ids[j]])
            # BOP scene_gt is camera-frame (cam_R_m2c); world alignment
            # goes to scene_camera via TWC (cam_R_w2c)
            TWOs.append(TCO[j])
            bboxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
            visib.append(m_visib.sum() / max(m_solo.sum(), 1))
        if not labels:
            return None

        bg = synth.background()
        rgb = np.where(mask[..., None], rgb, bg)
        rgb = np.clip(
            rgb + synth.rs.normal(0, 0.015, rgb.shape), 0.0, 1.0
        )
        # world-frame annotations: TWO + TWC (multi-view consistent)
        return SceneObservation(
            rgb=(rgb * 255).astype(np.uint8),
            K=scene.K,
            depth=depth_full,
            obj_labels=labels,
            TWO=np.stack(TWOs),
            bboxes=np.asarray(bboxes, np.float32),
            visib_fract=np.asarray(visib, np.float32),
            scene_id=0,
            view_id=0,
            TWC=scene.TWC,
        )

    frames = []
    tries = 0
    while len(frames) < args.n_frames and tries < args.n_frames * 20:
        tries += 1
        obs = render_frame(synth.sample_scene())
        if obs is None:
            continue
        obs.view_id = len(frames)
        frames.append(obs)
    write_bop_scene(args.out_dir, 0, frames)
    if args.wds:
        from happypose_tpu.datasets.web_scene_dataset import (
            write_scene_ds_as_wds,
        )

        shards = write_scene_ds_as_wds(
            frames, args.out_dir / "wds", shard_size=args.shard_size
        )
        logger.info(f"wrote {len(shards)} wds shards")
    if args.write_models:
        from happypose_tpu.datasets.bop import write_bop_models

        write_bop_models(args.out_dir / "models", mesh_db)
    logger.info(
        f"wrote {len(frames)} frames to {args.out_dir}/000000 "
        f"({tries} sampled)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
