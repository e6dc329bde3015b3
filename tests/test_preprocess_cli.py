"""Tests for the object-dataset preprocessing CLI (the make_gso_*/
make_shapenet_* pipeline analog)."""

import json

import numpy as np
import pytest

from happypose_tpu.meshes.io import (
    Mesh, load_ply, make_box_mesh, make_uv_sphere, position_colored, save_ply,
)
from happypose_tpu.scripts.preprocess_object_dataset import main


@pytest.fixture(scope="module")
def mesh_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("meshes")
    (root / "sub").mkdir()
    sphere = make_uv_sphere(0.05, 12, 16)
    # colorless variant: exercises the has_colors stat + subset filter
    save_ply(root / "sphere.ply",
             Mesh(vertices=sphere.vertices, faces=sphere.faces))
    save_ply(root / "sub" / "box.ply",
             position_colored(make_box_mesh((0.04, 0.03, 0.05))))
    return root


def test_stats_and_subset(mesh_dir, tmp_path):
    stats_file = tmp_path / "stats.json"
    assert main(["stats", "--in-dir", str(mesh_dir),
                 "--out", str(stats_file)]) == 0
    stats = json.loads(stats_file.read_text())
    assert set(stats) == {"sphere.ply", "sub/box.ply"}
    assert stats["sphere.ply"]["n_faces"] > 0
    # sphere diameter = 2r
    assert abs(stats["sphere.ply"]["diameter"] - 0.1) < 5e-3

    subset_file = tmp_path / "subset.json"
    assert main(["subset", "--stats", str(stats_file),
                 "--out", str(subset_file), "--require-colors"]) == 0
    assert json.loads(subset_file.read_text()) == ["sub/box.ply"]

    # face-count filter drops the (denser) sphere
    n_box = stats["sub/box.ply"]["n_faces"]
    assert main(["subset", "--stats", str(stats_file),
                 "--out", str(subset_file),
                 "--max-faces", str(n_box)]) == 0
    assert json.loads(subset_file.read_text()) == ["sub/box.ply"]


def test_scale_to_target_diameter(mesh_dir, tmp_path):
    out_dir = tmp_path / "scaled"
    assert main(["scale", "--in-dir", str(mesh_dir),
                 "--out-dir", str(out_dir),
                 "--target-diameter", "0.2"]) == 0
    m = load_ply(out_dir / "sphere.ply")
    assert abs(m.diameter - 0.2) < 1e-6
    m2 = load_ply(out_dir / "sub" / "box.ply")
    assert abs(m2.diameter - 0.2) < 1e-6
    assert m2.vertex_colors is not None  # colors survive the rescale


def test_pointclouds(mesh_dir, tmp_path):
    out_dir = tmp_path / "pc"
    assert main(["pointclouds", "--in-dir", str(mesh_dir),
                 "--out-dir", str(out_dir), "--n-points", "256"]) == 0
    d = np.load(out_dir / "sphere.npz")
    assert d["points"].shape == (256, 3)
    assert d["normals"].shape == (256, 3)
    # all sampled points lie on the sphere
    r = np.linalg.norm(d["points"], axis=-1)
    np.testing.assert_allclose(r, 0.05, atol=1e-3)
