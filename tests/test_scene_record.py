"""Batched on-device recorder (round-3): one-call render+composite+shade+
annotate; shadow-map, specular, blur, and annotation correctness.

The scene constructions here are hand-posed in the CAMERA frame so every
expected pixel value is geometrically derivable (shadow position from the
light ray, occlusion from depth ordering)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from happypose_tpu.datasets.scene_record import (
    BatchedSceneRecorder,
    make_floor_mesh,
    record_scene_batch,
)
from happypose_tpu.datasets.scene_synth import SceneSynthConfig
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere

H, W = 64, 80
K1 = np.asarray([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)


def _assets():
    db = MeshDataBase(meshes={
        "obj_000001": make_box_mesh((0.03, 0.03, 0.03)),
        "zz_floor": make_floor_mesh(half_size=0.4, n_grid=4),
    })
    return db, db.render_assets(texture_size=16)


def _call(assets, obj_ids, TCO, valid, annotate, lights, T_LC, K_L,
          materials, enable_shadows=True, n_scenes=1):
    M = len(obj_ids)
    B = n_scenes
    bg = jnp.zeros((1, H, W, 3), jnp.uint8)
    return record_scene_batch(
        assets,
        jnp.asarray(obj_ids, jnp.int32),
        jnp.zeros(M, jnp.int32),
        jnp.asarray(TCO),
        jnp.asarray(np.tile(K1[None], (B, 1, 1))),
        jnp.asarray(valid),
        jnp.asarray(annotate),
        jnp.asarray(lights),
        jnp.asarray(T_LC),
        jnp.asarray(K_L),
        jnp.asarray(materials),
        bg,
        jnp.zeros(B, jnp.int32),
        jnp.ones((B, 3), jnp.float32),
        jax.random.PRNGKey(0),
        n_scenes=B,
        resolution=(H, W),
        renderer="reference",
        shadow_size=64,
        enable_shadows=enable_shadows,
    )


def _shadow_scene():
    """Floor facing the camera at z=0.5; 3cm box at (0.05, 0, 0.35);
    light tilted so the box's shadow lands left of it on the floor."""
    db, assets = _assets()
    TCO = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    TCO[0, :3, 3] = (0.05, 0.0, 0.35)
    # floor: object +z -> camera -z (normal toward camera)
    TCO[1, :3, :3] = np.diag([1.0, -1.0, -1.0])
    TCO[1, :3, 3] = (0.0, 0.0, 0.5)
    d = np.asarray([0.5, 0.0, -1.0])
    d = d / np.linalg.norm(d)
    lights = np.asarray([[*d, 0.4, 0.6]], np.float32)
    # light camera: at center + d * rho looking back
    from happypose_tpu.datasets.scene_record import light_camera

    T_LC, K_L = light_camera(
        d, TCO, np.asarray([True, False]), np.asarray([0.1, 1.0]), 64
    )
    materials = np.asarray([[0.0, 16.0, 0.0, 0.0]], np.float32)
    args = (
        assets,
        [db.label_to_id["obj_000001"], db.label_to_id["zz_floor"]],
        TCO, [True, True], [True, False], lights, T_LC[None], K_L[None],
        materials,
    )
    return args


def _uv_of(x, y, z):
    return int(round(K1[0, 0] * x / z + K1[0, 2])), int(
        round(K1[1, 1] * y / z + K1[1, 2])
    )


def test_shadow_darkens_expected_floor_pixel():
    args = _shadow_scene()
    lit = np.asarray(_call(*args, enable_shadows=False).rgb[0], np.float32)
    sh = np.asarray(_call(*args, enable_shadows=True).rgb[0], np.float32)
    # shadow ray: from the box center along -d to the floor plane z=0.5
    # (0.05,0,0.35) + k*(-0.4472,0,0.8944), k=0.15/0.8944 -> x=-0.025
    u_s, v_s = _uv_of(-0.025, 0.0, 0.5)
    u_c, v_c = _uv_of(0.17, 0.0, 0.5)  # control pixel, far from the shadow
    assert sh[v_s, u_s].mean() < 0.75 * lit[v_s, u_s].mean()
    np.testing.assert_allclose(
        sh[v_c, u_c], lit[v_c, u_c], atol=3.0
    )
    # no self-shadow acne: the lit-floor mean barely moves
    floor_rows = slice(v_c - 2, v_c + 3)
    assert abs(
        sh[floor_rows, u_c - 2: u_c + 3].mean()
        - lit[floor_rows, u_c - 2: u_c + 3].mean()
    ) < 4.0


def test_annotations_occlusion_and_floor_excluded():
    db, assets = _assets()
    # two boxes on the optical axis: front at z=0.3 fully occludes the
    # center of the back one at z=0.6 (same size -> back is half-size on
    # screen, fully hidden)
    TCO = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    TCO[0, :3, 3] = (0.0, 0.0, 0.3)
    TCO[1, :3, 3] = (0.0, 0.0, 0.6)
    TCO[2, :3, :3] = np.diag([1.0, -1.0, -1.0])
    TCO[2, :3, 3] = (0.0, 0.0, 0.9)
    lights = np.asarray([[0, 0, -1, 0.5, 0.5]], np.float32)
    out = _call(
        assets, [0, 0, db.label_to_id["zz_floor"]], TCO,
        [True, True, True], [True, True, False], lights,
        np.eye(4, dtype=np.float32)[None], K1[None],
        np.asarray([[0.0, 16.0, 0.0, 0.0]], np.float32),
        enable_shadows=False,
    )
    visib = np.asarray(out.visib_px)
    solo = np.asarray(out.solo_px)
    assert visib[0] == solo[0] > 0  # front box unoccluded
    assert visib[1] == 0  # back box fully hidden
    assert solo[1] > 0
    assert visib[2] == 0  # floor rendered but never annotated
    assert bool(out.any_vis[0])
    # floor touches the border but must not trip the border check
    assert not bool(out.border_bad[0])
    # front box bbox centered and tight: 3cm half-extent at z=0.3 with
    # f=80 -> half-width 8 px
    bb = np.asarray(out.bbox[0])
    np.testing.assert_allclose(bb, [32, 24, 48, 40], atol=1.5)


def test_border_flag_set_when_object_clipped():
    db, assets = _assets()
    TCO = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    TCO[0, :3, 3] = (0.38, 0.0, 0.8)  # straddles the right edge (u~75..81)
    lights = np.asarray([[0, 0, -1, 0.5, 0.5]], np.float32)
    out = _call(
        assets, [0], TCO, [True], [True], lights,
        np.eye(4, dtype=np.float32)[None], K1[None],
        np.asarray([[0.0, 16.0, 0.0, 0.0]], np.float32),
        enable_shadows=False,
    )
    assert bool(out.border_bad[0])


def test_specular_and_blur():
    db, assets = _assets()
    TCO = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    TCO[0, :3, 3] = (0.0, 0.0, 0.4)
    lights = np.asarray([[0, 0, -1, 0.4, 0.5]], np.float32)

    def run(mat):
        return np.asarray(_call(
            assets, [0], TCO, [True], [True], lights,
            np.eye(4, dtype=np.float32)[None], K1[None],
            np.asarray([mat], np.float32), enable_shadows=False,
        ).rgb[0], np.float32)

    plain = run([0.0, 16.0, 0.0, 0.0])
    shiny = run([0.5, 32.0, 0.0, 0.0])
    assert shiny.max() > plain.max() + 20  # visible highlight
    blurred = run([0.0, 16.0, 1.5, 0.0])
    # blur spreads edges: peak gradient falls (total variation doesn't)
    g = lambda im: np.abs(np.diff(im, axis=1)).max()
    assert g(blurred) < 0.7 * g(plain)
    sharp = run([0.0, 16.0, 0.0, 0.0])
    np.testing.assert_allclose(sharp, plain, atol=1.0)


def test_batched_recorder_end_to_end():
    """Full host wrapper: DR scenes, floor, shadows, annotations."""
    db = MeshDataBase(meshes={
        "obj_000001": make_uv_sphere(0.03, 10, 14, with_uv=True),
        "obj_000002": make_box_mesh((0.03, 0.02, 0.04)),
    })
    cfg = SceneSynthConfig(resolution=(48, 64), proba_falling=1.0)
    rec = BatchedSceneRecorder(
        db, cfg, seed=0, batch_scenes=4, shadow_size=48,
        randomize_object_textures=True,
    )
    frames = rec.record(5)
    assert len(frames) == 5
    for f in frames:
        assert f.rgb.shape == (48, 64, 3) and f.rgb.dtype == np.uint8
        assert len(f.labels) >= 1
        assert (f.visib_fract > 0).all() and (f.visib_fract <= 1).all()
        assert (f.bboxes[:, 2] > f.bboxes[:, 0]).all()
        # border check honored: no annotated bbox touches the frame edge
        assert (f.bboxes[:, 0] > 0).all() and (f.bboxes[:, 1] > 0).all()
        assert (f.bboxes[:, 2] < 63).all() and (f.bboxes[:, 3] < 47).all()
        # every annotated object is in front of the camera
        assert (f.TCO[:, 2, 3] > 0).all()


def test_record_multiview_world_consistent():
    """Views of one multi-view scene agree on world-frame object poses
    (TWC_v @ TCO_v identical across views) — the property multiview
    RANSAC+BA consumes."""
    db = MeshDataBase(meshes={
        "obj_000001": make_uv_sphere(0.03, 10, 14),
        "obj_000002": make_box_mesh((0.03, 0.02, 0.04)),
    })
    cfg = SceneSynthConfig(resolution=(48, 64), border_check=False)
    rec = BatchedSceneRecorder(
        db, cfg, seed=2, batch_scenes=8, shadow_size=48,
    )
    groups = rec.record_multiview(n_scenes=2, n_views=4, min_views=2)
    assert len(groups) == 2
    for views in groups:
        assert len(views) >= 2
        world = {}
        for f in views:
            for lbl, tco in zip(f.labels, f.TCO):
                two = f.TWC @ tco
                if lbl in world:
                    np.testing.assert_allclose(
                        two, world[lbl], atol=1e-4
                    )
                else:
                    world[lbl] = two
