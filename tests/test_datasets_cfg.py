"""String dataset registry: name conventions resolve to working loaders."""

import json

import numpy as np
import pytest

from happypose_tpu.datasets import make_object_dataset, make_scene_dataset
from happypose_tpu.datasets.bop import write_bop_models, write_bop_scene
from happypose_tpu.datasets.datasets_cfg import keep_bop19_targets
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere, save_ply


@pytest.fixture
def data_root(tmp_path):
    """A HAPPYPOSE_DATA_DIR with one tiny BOP dataset 'toy'."""
    db = MeshDataBase(meshes={
        "obj_000001": make_uv_sphere(0.04, 8, 12),
        "obj_000002": make_box_mesh((0.035, 0.025, 0.045)),
    })
    bop = tmp_path / "bop_datasets" / "toy"
    write_bop_models(bop / "models", db)
    from happypose_tpu.datasets.bop import SceneObservation

    K = np.asarray([[300.0, 0, 60], [0, 300.0, 45], [0, 0, 1]], np.float32)
    frames = [
        SceneObservation(
            rgb=np.zeros((90, 120, 3), np.uint8), K=K,
            obj_labels=["obj_000001"],
            TWO=np.eye(4, dtype=np.float32)[None],
            bboxes=np.asarray([[10, 10, 50, 50]], np.float32),
            visib_fract=np.ones(1, np.float32),
            scene_id=0, view_id=v,
        )
        for v in range(4)
    ]
    write_bop_scene(bop / "test", 0, frames)
    (bop / "test_targets_bop19.json").write_text(json.dumps(
        [{"scene_id": 0, "im_id": 1, "obj_id": 1, "inst_count": 1},
         {"scene_id": 0, "im_id": 3, "obj_id": 1, "inst_count": 1}]
    ))
    return tmp_path


def test_scene_by_split_name(data_root):
    ds = make_scene_dataset("toy.test", data_dir=data_root)
    assert len(ds) == 4
    assert ds[0].rgb.shape == (90, 120, 3)


def test_bop19_targets_filter(data_root):
    ds = make_scene_dataset("toy.bop19", data_dir=data_root)
    assert ds.frames == [(0, 1), (0, 3)]


def test_n_frames_truncation(data_root):
    ds = make_scene_dataset("toy.test", data_dir=data_root, n_frames=2)
    assert len(ds) == 2


def test_explicit_path(data_root):
    ds = make_scene_dataset(str(data_root / "bop_datasets/toy/test"))
    assert len(ds) == 4


def test_object_dataset_names(data_root):
    for name in ("toy", "toy.cad"):
        obj = make_object_dataset(name, data_dir=data_root)
        assert obj.labels == ["obj_000001", "obj_000002"]


def test_meshdir_objects(tmp_path):
    save_ply(tmp_path / "thing.ply", make_box_mesh((10.0, 10.0, 10.0)))
    obj = make_object_dataset(f"meshdir.{tmp_path}")
    assert "thing" in obj.mesh_db.labels


def test_unknown_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        make_scene_dataset("nope.test", data_dir=tmp_path)
