"""End-to-end test of the custom-scenario multiview CLI.

Mirrors the reference's run_custom_scenario flow (cosypose/scripts/
run_custom_scenario.py): candidates.csv + scene_camera.json + models/ in,
fused scene.json + reprojected poses.csv out."""

import json

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from happypose_tpu.evaluation.bop_export import load_bop_csv, save_bop_csv
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere, save_ply


@pytest.fixture(scope="module")
def scenario_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenario")
    models = root / "models"
    models.mkdir()
    # BOP models in mm
    save_ply(models / "obj_000001.ply", make_uv_sphere(40.0, 10, 12))
    save_ply(models / "obj_000002.ply", make_box_mesh((40.0, 30.0, 50.0)))
    save_ply(models / "obj_000003.ply", make_box_mesh((50.0, 50.0, 20.0)))
    (models / "models_info.json").write_text(
        json.dumps(
            {
                "1": {"diameter": 80.0},
                "2": {"diameter": 70.7},
                "3": {"diameter": 73.5},
            }
        )
    )

    rng = np.random.RandomState(0)
    n_views, n_objects = 3, 3
    TWO = np.tile(np.eye(4), (n_objects, 1, 1))
    TWO[:, :3, :3] = ScipyRot.random(n_objects, random_state=1).as_matrix()
    TWO[:, :3, 3] = rng.uniform(-0.1, 0.1, (n_objects, 3))
    TWC = np.tile(np.eye(4), (n_views, 1, 1))
    for v in range(n_views):
        TWC[v, :3, :3] = ScipyRot.from_euler("y", 0.15 * (v - 1)).as_matrix()
        TWC[v, :3, 3] = [0.1 * (v - 1), 0.0, -0.6]
    K = np.eye(3)
    K[0, 0] = K[1, 1] = 400.0
    K[0, 2], K[1, 2] = 160.0, 120.0

    # per-view candidates: gt + noise, plus one low-score garbage candidate
    poses, objs, scenes, views, scores = [], [], [], [], []
    for v in range(n_views):
        for o in range(n_objects):
            TCO = np.linalg.inv(TWC[v]) @ TWO[o]
            noise = np.eye(4)
            noise[:3, :3] = ScipyRot.from_rotvec(
                rng.normal(0, 0.01, 3)
            ).as_matrix()
            noise[:3, 3] = rng.normal(0, 0.002, 3)
            poses.append(TCO @ noise)
            objs.append(o + 1)
            scenes.append(7)
            views.append(v * 10)  # sparse view ids
            scores.append(0.9)
    T_bad = np.eye(4)
    T_bad[:3, 3] = [0.5, 0.5, 2.0]
    poses.append(T_bad)
    objs.append(1)
    scenes.append(7)
    views.append(0)
    scores.append(0.1)  # filtered by --sv-score-th
    save_bop_csv(
        root / "candidates.csv",
        np.asarray(poses), np.asarray(objs), np.asarray(scenes),
        np.asarray(views), np.asarray(scores),
    )
    (root / "scene_camera.json").write_text(
        json.dumps(
            {str(v * 10): {"cam_K": K.reshape(-1).tolist()}
             for v in range(n_views)}
        )
    )
    return dict(root=root, TWO=TWO, TWC=TWC, n_objects=n_objects,
                n_views=n_views)


def test_custom_scenario_cli(scenario_dir):
    from happypose_tpu.scripts.run_custom_scenario import main

    root = scenario_dir["root"]
    rc = main(["--scenario", str(root), "--ransac-n-iter", "30",
               "--ba-n-iter", "15", "--sv-score-th", "0.3"])
    assert rc == 0
    scene = json.loads((root / "results" / "scene.json").read_text())
    assert len(scene["objects"]) == scenario_dir["n_objects"]
    assert len(scene["cameras"]) == scenario_dir["n_views"]
    assert {c["view_id"] for c in scene["cameras"]} == {0, 10, 20}

    # reprojected poses: objects x views rows, close to gt TCO
    out = load_bop_csv(root / "results" / "poses.csv")
    assert len(out["poses"]) == 9
    TWO, TWC = scenario_dir["TWO"], scenario_dir["TWC"]
    errs = []
    for i in range(len(out["poses"])):
        v = int(out["view_ids"][i]) // 10
        o = int(out["obj_ids"][i]) - 1
        T_gt = np.linalg.inv(TWC[v]) @ TWO[o]
        errs.append(np.linalg.norm(out["poses"][i][:3, 3] - T_gt[:3, 3]))
    # BA output is up to a world gauge; reprojection into views removes it
    assert np.median(errs) < 0.02


def test_nms3d_merges_close_objects():
    from happypose_tpu.multiview.scene_predictor import nms3d

    TWO = np.tile(np.eye(4), (3, 1, 1))
    TWO[1, :3, 3] = [0.01, 0.0, 0.0]  # within 4cm of object 0
    TWO[2, :3, 3] = [0.5, 0.0, 0.0]
    keep = nms3d(TWO, scores=np.array([0.9, 0.5, 0.7]), th=0.04)
    assert keep.tolist() == [0, 2]
