"""Rasterizer golden tests — mirrors the reference's renderer test strategy
(tests/test_batch_renderer_panda3d.py: shape/dtype checks, cross-camera
consistency, background/object pixel probes, depth probes) with analytic
oracles instead of stored golden PNGs."""

import numpy as np
import jax.numpy as jnp

from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.ops.rasterizer import render_batch


H, W = 120, 160


def _setup():
    db = MeshDataBase(
        meshes={
            "sphere": make_uv_sphere(radius=0.05, n_lat=24, n_lon=32),
            "box": make_box_mesh((0.04, 0.04, 0.04)),
        }
    )
    assets = db.render_assets()
    K = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 300.0
    K[:, 0, 2] = W / 2
    K[:, 1, 2] = H / 2
    TCO = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    TCO[:, 2, 3] = 0.5
    return db, assets, jnp.asarray(K), jnp.asarray(TCO)


def test_shapes_dtypes_and_consistency():
    db, assets, K, TCO = _setup()
    obj_ids = jnp.asarray([db.id_of("sphere")] * 4, jnp.int32)
    out = render_batch(assets, obj_ids, TCO, K, resolution=(H, W))
    assert out.rgb.shape == (4, H, W, 3) and out.rgb.dtype == jnp.float32
    assert out.depth.shape == (4, H, W)
    assert out.mask.shape == (4, H, W) and out.mask.dtype == bool
    assert out.normals.shape == (4, H, W, 3)
    # 4 identical cameras -> identical renders
    for arr in (out.rgb, out.depth, out.normals):
        np.testing.assert_allclose(np.asarray(arr[0]), np.asarray(arr[1]), atol=0)
        np.testing.assert_allclose(np.asarray(arr[0]), np.asarray(arr[3]), atol=0)


def test_probes_sphere():
    db, assets, K, TCO = _setup()
    obj_ids = jnp.asarray([db.id_of("sphere")] * 4, jnp.int32)
    out = render_batch(assets, obj_ids, TCO, K, resolution=(H, W))
    rgb = np.asarray(out.rgb[0])
    depth = np.asarray(out.depth[0])
    mask = np.asarray(out.mask[0])

    # background corners: black, no mask, zero depth
    for (i, j) in [(0, 0), (0, W - 1), (H - 1, 0), (H - 1, W - 1)]:
        assert not mask[i, j]
        assert depth[i, j] == 0.0
        np.testing.assert_array_equal(rgb[i, j], 0.0)

    # center pixel: hit, depth == z - r within a pixel-quantization tolerance
    ci, cj = H // 2, W // 2
    assert mask[ci, cj]
    np.testing.assert_allclose(depth[ci, cj], 0.5 - 0.05, atol=2e-3)
    # object is lit (green-ish sphere color 0.2/0.6/0.3 scaled by shading)
    assert rgb[ci, cj, 1] > 0.15
    # projected radius: r_px = f * r / sqrt(z^2 - r^2) (sphere silhouette)
    r_px_expected = 300.0 * 0.05 / np.sqrt(0.5**2 - 0.05**2)
    cols = np.where(mask[ci])[0]
    r_px = (cols.max() - cols.min()) / 2
    np.testing.assert_allclose(r_px, r_px_expected, atol=1.5)
    # center normal points back at the camera
    # tessellation near the pole limits accuracy (24x32 sphere)
    np.testing.assert_allclose(np.asarray(out.normals[0, ci, cj]), [0, 0, -1], atol=0.1)


def test_probes_box_depth_and_mask_area():
    db, assets, K, TCO = _setup()
    obj_ids = jnp.asarray([db.id_of("box")] * 4, jnp.int32)
    out = render_batch(assets, obj_ids, TCO, K, resolution=(H, W))
    depth = np.asarray(out.depth[0])
    mask = np.asarray(out.mask[0])
    ci, cj = H // 2, W // 2
    # front face of the box at z = 0.5 - 0.04
    np.testing.assert_allclose(depth[ci, cj], 0.46, atol=1e-3)
    # face-on square: projected side = f * 0.08 / 0.46 px
    side_px = 300.0 * 0.08 / 0.46
    np.testing.assert_allclose(mask.sum(), side_px**2, rtol=0.05)
    # depth is flat across the front face
    assert abs(depth[ci + 5, cj + 5] - depth[ci, cj]) < 1e-4


def test_offcenter_translation():
    db, assets, K, TCO = _setup()
    TCO = TCO.at[:, 0, 3].set(0.05)  # move +x -> image +u
    obj_ids = jnp.asarray([db.id_of("sphere")] * 4, jnp.int32)
    out = render_batch(assets, obj_ids, TCO, K, resolution=(H, W))
    mask = np.asarray(out.mask[0])
    ys, xs = np.where(mask)
    cu = xs.mean()
    expected_u = W / 2 + 300.0 * 0.05 / 0.5
    np.testing.assert_allclose(cu, expected_u, atol=1.5)


def test_behind_camera_is_empty():
    db, assets, K, TCO = _setup()
    TCO = TCO.at[:, 2, 3].set(-0.5)
    obj_ids = jnp.asarray([db.id_of("sphere")] * 4, jnp.int32)
    out = render_batch(assets, obj_ids, TCO, K, resolution=(H, W))
    assert not bool(np.asarray(out.mask).any())


def test_mixed_objects_batch():
    db, assets, K, TCO = _setup()
    obj_ids = jnp.asarray(
        [db.id_of("sphere"), db.id_of("box"), db.id_of("sphere"), db.id_of("box")],
        jnp.int32,
    )
    out = render_batch(assets, obj_ids, TCO, K, resolution=(H, W))
    m = np.asarray(out.mask)
    # sphere and box have different silhouettes
    assert (m[0] != m[1]).any()
    np.testing.assert_array_equal(m[0], m[2])
    np.testing.assert_array_equal(m[1], m[3])


def test_scene_compositing():
    """Two overlapping objects in one scene: nearer object wins per pixel."""
    import jax.numpy as jnp
    from happypose_tpu.ops.scene_renderer import render_scenes

    db, assets, K, TCO = _setup()
    # sphere in front (z=0.4) centered; box behind (z=0.55) shifted +x so it
    # peeks out on the right of the sphere
    T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    T[0, 2, 3] = 0.4
    T[1, 0, 3] = 0.05
    T[1, 2, 3] = 0.55
    out = render_scenes(
        assets,
        jnp.asarray([db.id_of("sphere"), db.id_of("box")], jnp.int32),
        jnp.asarray([0, 0], jnp.int32),
        jnp.asarray(T),
        jnp.asarray(np.asarray(K)[:2]),
        jnp.ones(2, bool),
        n_scenes=1,
        resolution=(H, W),
    )
    depth = np.asarray(out.depth[0])
    ci, cj = H // 2, W // 2
    # center: sphere front surface at 0.35 (sphere occludes the box)
    np.testing.assert_allclose(depth[ci, cj], 0.4 - 0.05, atol=3e-3)
    # right of the sphere silhouette: box front face at 0.51
    sphere_r_px = 300.0 * 0.05 / np.sqrt(0.4**2 - 0.05**2)  # ~37.8
    probe_u = cj + int(sphere_r_px) + 5
    assert depth[ci, probe_u] > 0.45
    np.testing.assert_allclose(depth[ci, probe_u], 0.51, atol=5e-3)
