"""Domain-randomized scene engine (VERDICT r1 missing #4 / task #6):
resting-pose solver, collision separation, spherical cameras, per-scene
lighting, and the BOP recording CLI end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from happypose_tpu.datasets.scene_synth import (
    SceneSynthConfig,
    SceneSynthesizer,
    look_at_TWC,
    resting_height,
    separate_footprints,
)
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere


def _db():
    return MeshDataBase(meshes={
        "obj_000001": make_uv_sphere(0.03, 10, 14),
        "obj_000002": make_box_mesh((0.03, 0.02, 0.04)),
        "obj_000003": make_box_mesh((0.02, 0.02, 0.02)),
    })


def test_resting_height_touches_plane():
    box = make_box_mesh((0.03, 0.02, 0.04))
    rs = np.random.RandomState(0)
    from happypose_tpu.datasets.scene_synth import random_rotations_np

    for R in random_rotations_np(rs, 8):
        z = resting_height(box.vertices, R)
        vz = (box.vertices @ R.T)[:, 2] + z
        assert vz.min() > -1e-6  # nothing below the plane
        assert vz.min() < 1e-6  # and in contact with it


def test_separation_resolves_overlap():
    xy = np.zeros((4, 2))  # all stacked at the origin
    radii = np.full(4, 0.03)
    out = separate_footprints(xy, radii)
    for i in range(4):
        for j in range(i + 1, 4):
            assert np.linalg.norm(out[i] - out[j]) >= 0.06 - 1e-3


def test_look_at_camera_points_at_target():
    target = np.asarray([0.05, -0.02, 0.03])
    T = look_at_TWC(target, rho=0.6, theta=0.7, phi=1.1, roll=0.2)
    # camera at distance rho
    np.testing.assert_allclose(
        np.linalg.norm(T[:3, 3] - target), 0.6, atol=1e-6
    )
    # target on the optical axis: TCW @ target has x=y=0, z=rho
    TCW = np.linalg.inv(T)
    t_cam = TCW[:3, :3] @ target + TCW[:3, 3]
    np.testing.assert_allclose(t_cam[:2], 0.0, atol=1e-6)
    np.testing.assert_allclose(t_cam[2], 0.6, atol=1e-6)
    # rotation is orthonormal
    np.testing.assert_allclose(
        T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-6
    )


def test_sample_scene_deterministic_and_in_front():
    cfg = SceneSynthConfig(resolution=(48, 64))
    a = SceneSynthesizer(_db(), cfg, seed=5).sample_scene()
    b = SceneSynthesizer(_db(), cfg, seed=5).sample_scene()
    np.testing.assert_array_equal(a.TWO, b.TWO)
    np.testing.assert_array_equal(a.K, b.K)
    # every object in front of the camera
    assert (a.TCO[:, 2, 3] > 0.05).all()
    # light row sane
    assert a.light.shape == (5,)
    np.testing.assert_allclose(np.linalg.norm(a.light[:3]), 1.0, atol=1e-5)


def test_per_scene_lighting_changes_render():
    db = _db()
    assets = db.render_assets()
    from happypose_tpu.ops.rasterizer import render_batch

    TCO = jnp.eye(4)[None].at[:, 2, 3].set(0.4)
    K = jnp.asarray([[[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]]])
    ids = jnp.zeros(1, jnp.int32)
    head = render_batch(assets, ids, TCO, K, resolution=(48, 64))
    side = render_batch(
        assets, ids, TCO, K, resolution=(48, 64),
        lights=jnp.asarray([[1.0, 0, 0, 0.2, 0.9]]),
    )
    m = np.asarray(head.mask[0])
    assert m.sum() > 50
    d = np.abs(np.asarray(head.rgb[0]) - np.asarray(side.rgb[0]))[m]
    assert d.mean() > 0.02  # lighting direction visibly changes shading


def test_record_cli_end_to_end(tmp_path):
    """Recorder writes a loadable BOP split with occlusion-aware
    visib_fract and world-consistent camera poses."""
    from happypose_tpu.datasets.bop import BOPSceneDataset
    from happypose_tpu.scripts.record_synthetic_dataset import main

    out = tmp_path / "ds"
    rc = main([
        "--out-dir", str(out), "--n-frames", "3", "--resolution", "60", "80",
        "--seed", "3", "--write-models", "--textures-on-objects",
        "--proba-falling", "1.0",
    ])
    assert rc == 0
    ds = BOPSceneDataset(out, load_depth=True)
    assert len(ds) == 3
    obs = ds[0]
    assert obs.rgb.shape == (60, 80, 3)
    assert obs.TWO is not None and len(obs.obj_labels) >= 1
    assert (np.asarray(obs.visib_fract) > 0).all()
    assert (np.asarray(obs.visib_fract) <= 1.0).all()
    # depth present and object in front of camera
    assert obs.depth is not None and obs.depth.max() > 0.1
