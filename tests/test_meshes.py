"""Mesh IO round-trips and padded database invariants."""

import numpy as np

from happypose_tpu.meshes.io import (
    Mesh,
    load_mesh,
    save_ply,
    make_box_mesh,
    make_uv_sphere,
)
from happypose_tpu.meshes.database import MeshDataBase


def test_ply_round_trip(tmp_path):
    mesh = make_box_mesh((0.1, 0.2, 0.3))
    p = tmp_path / "box.ply"
    save_ply(p, mesh)
    loaded = load_mesh(p)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)
    np.testing.assert_allclose(loaded.vertex_colors, mesh.vertex_colors, atol=1 / 255.0)


def test_obj_loader(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\n")
    mesh = load_mesh(p)
    assert mesh.vertices.shape == (4, 3)
    assert mesh.faces.shape == (2, 3)


def test_diameter():
    mesh = make_box_mesh((0.5, 0.5, 0.5))
    np.testing.assert_allclose(mesh.diameter, np.sqrt(3.0), rtol=1e-5)
    sph = make_uv_sphere(radius=0.25)
    np.testing.assert_allclose(sph.diameter, 0.5, rtol=1e-2)


def test_vertex_normals_sphere():
    sph = make_uv_sphere(radius=1.0, n_lat=32, n_lon=48)
    n = sph.vertex_normals
    v = sph.vertices
    # normals of a sphere point radially outward
    inner = np.abs(np.sum(n * v / np.linalg.norm(v, axis=-1, keepdims=True), -1))
    # skip poles (duplicated vertices give degenerate normals there)
    mask = np.abs(v[:, 2]) < 0.99
    assert inner[mask].min() > 0.95


def test_database_padding_and_select():
    db = MeshDataBase(
        meshes={
            "obj_A": make_box_mesh((0.1, 0.1, 0.1)),
            "obj_B": make_uv_sphere(radius=0.2),
        },
        symmetries={
            "obj_A": np.tile(np.eye(4, dtype=np.float32), (4, 1, 1)),
        },
    )
    bm = db.batched(n_points=100)
    assert bm.points.shape == (2, 100, 3)
    assert bm.symmetries.shape == (2, 4, 4, 4)
    assert bool(bm.symmetries_mask[0].sum() == 4)
    assert bool(bm.symmetries_mask[1].sum() == 1)  # identity only
    # select by id
    ids = np.asarray([1, 1, 0], np.int32)
    sel = bm.select(ids)
    assert sel.points.shape == (3, 100, 3)
    np.testing.assert_allclose(
        np.asarray(sel.diameters),
        [np.asarray(bm.diameters)[1]] * 2 + [np.asarray(bm.diameters)[0]],
    )

    ra = db.render_assets()
    assert ra.vertices.shape[0] == 2
    assert ra.faces_mask.dtype == bool
    # padding faces are degenerate
    fm = np.asarray(ra.faces_mask)
    f = np.asarray(ra.faces)
    for i in range(2):
        pad = f[i][~fm[i]]
        assert np.all(pad == 0)


def test_database_aabb_mode():
    db = MeshDataBase(meshes={"a": make_box_mesh((0.1, 0.2, 0.3))})
    bm = db.batched(aabb=True)
    assert bm.points.shape == (1, 8, 3)
    np.testing.assert_allclose(np.abs(np.asarray(bm.points[0])),
                               np.tile([0.1, 0.2, 0.3], (8, 1)), atol=1e-6)


def test_native_ply_matches_python(tmp_path):
    """The C++ fast path must parse identically to the Python parser."""
    from happypose_tpu.meshes.io import load_ply
    import happypose_tpu.csrc as csrc

    mesh = make_uv_sphere(radius=0.07, n_lat=20, n_lon=30)
    p = tmp_path / "m.ply"
    save_ply(p, mesh)
    native = csrc.load_ply_native(p)
    if native is None:
        import pytest

        pytest.skip("native build unavailable")
    orig = csrc.load_ply_native
    csrc.load_ply_native = lambda _: None
    try:
        py = load_ply(p)
    finally:
        csrc.load_ply_native = orig
    np.testing.assert_allclose(native["vertices"], py.vertices, atol=0)
    np.testing.assert_array_equal(native["faces"], py.faces)
    np.testing.assert_allclose(
        native["colors"].astype(np.float32) / 255.0, py.vertex_colors,
        atol=1e-6,
    )


class TestDecimation:
    """Vertex-clustering decimation: face budget + silhouette fidelity."""

    def test_budget_and_attrs(self):
        from happypose_tpu.meshes.io import decimate_mesh, load_mesh
        from pathlib import Path

        ref = Path("/root/reference/tests/data/obj_000001.ply")
        if not ref.is_file():
            import pytest

            pytest.skip("reference fixture absent")
        m = load_mesh(ref)
        d = decimate_mesh(m, 4000)
        assert len(d.faces) <= 4000
        assert len(d.faces) > 500  # not degenerate
        assert d.vertex_uv is not None and len(d.vertex_uv) == len(d.vertices)
        # all face indices valid
        assert d.faces.max() < len(d.vertices)

    def test_silhouette_close_to_original(self):
        import jax.numpy as jnp

        from happypose_tpu.meshes.database import MeshDataBase
        from happypose_tpu.meshes.io import decimate_mesh, make_uv_sphere
        from happypose_tpu.ops.rasterizer import render_batch

        m = make_uv_sphere(0.05, 24, 32)
        d = decimate_mesh(m, 600)
        assert len(d.faces) <= 600
        db = MeshDataBase(meshes={"a": m, "b": d})
        assets = db.render_assets()
        K = jnp.asarray([[[200.0, 0, 48], [0, 200.0, 32], [0, 0, 1]]] * 2)
        TCO = jnp.tile(jnp.eye(4)[None], (2, 1, 1)).at[:, 2, 3].set(0.4)
        out = render_batch(
            assets, jnp.asarray([0, 1], jnp.int32), TCO, K,
            resolution=(64, 96),
        )
        a = np.asarray(out.mask[0])
        b = np.asarray(out.mask[1])
        iou = (a & b).sum() / max((a | b).sum(), 1)
        assert iou > 0.9, iou


def test_save_ply_texture_round_trip(tmp_path):
    """Textured meshes survive a save/load round trip with full texture
    detail (BOP TextureFile convention) - no vertex-color baking."""
    import numpy as np

    from happypose_tpu.meshes.io import (
        load_mesh, make_random_texture, make_uv_sphere, save_ply,
    )

    rs = np.random.RandomState(3)
    m = make_uv_sphere(0.04, 12, 16, with_uv=True)
    m.texture = make_random_texture(rs, 64)
    save_ply(tmp_path / "tex.ply", m)
    assert (tmp_path / "tex.png").exists()
    back = load_mesh(tmp_path / "tex.ply")
    np.testing.assert_allclose(back.vertices, m.vertices, atol=1e-6)
    np.testing.assert_allclose(back.vertex_uv, m.vertex_uv, atol=1e-6)
    assert back.texture is not None
    # uint8 png quantization only
    np.testing.assert_allclose(back.texture, m.texture, atol=2.5 / 255.0)


def test_write_bop_models_keeps_textures(tmp_path):
    import numpy as np

    from happypose_tpu.datasets.bop import BOPObjectDataset, write_bop_models
    from happypose_tpu.meshes.database import MeshDataBase
    from happypose_tpu.meshes.io import make_random_texture, make_uv_sphere

    rs = np.random.RandomState(4)
    s = make_uv_sphere(0.04, 12, 16, with_uv=True)
    s.texture = make_random_texture(rs, 64)
    db = MeshDataBase(meshes={"obj_000001": s})
    write_bop_models(tmp_path / "models", db)
    back = BOPObjectDataset(tmp_path / "models")
    m = back.mesh_db.meshes["obj_000001"]
    assert m.texture is not None and m.vertex_uv is not None
    np.testing.assert_allclose(m.texture, s.texture, atol=2.5 / 255.0)
