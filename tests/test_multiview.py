"""Multi-view RANSAC matching + bundle adjustment on a synthetic scene.

Scene: 3 objects in a world frame, 3 cameras on a small arc; candidates are
ground-truth per-view poses plus noise, with one garbage outlier candidate.
The matcher must group candidates of the same physical object, reject the
outlier, and recover relative camera poses; BA must reduce reprojection
loss and recover relative object placement."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.multiview import (
    MultiviewCandidates,
    MultiviewRefinement,
    multiview_candidate_matching,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(0)
    db = MeshDataBase(
        meshes={
            "box_a": make_box_mesh((0.04, 0.03, 0.05)),
            "box_b": make_box_mesh((0.05, 0.05, 0.02)),
            "sphere": make_uv_sphere(radius=0.04, n_lat=10, n_lon=12),
        }
    )
    bm = db.batched(n_points=64)
    n_views, n_objects = 3, 3
    # objects in world
    TWO = np.tile(np.eye(4), (n_objects, 1, 1))
    TWO[:, :3, :3] = ScipyRot.random(n_objects, random_state=1).as_matrix()
    TWO[:, :3, 3] = rng.uniform(-0.1, 0.1, (n_objects, 3))
    # cameras looking at origin from z=-0.6 with slight offsets
    TWC = np.tile(np.eye(4), (n_views, 1, 1))
    for v in range(n_views):
        ang = 0.15 * (v - 1)
        TWC[v, :3, :3] = ScipyRot.from_euler("y", ang).as_matrix()
        TWC[v, :3, 3] = [0.1 * (v - 1), 0.0, -0.6]
    K = np.tile(np.eye(3, dtype=np.float32), (n_views, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 400.0
    K[:, 0, 2] = 160.0
    K[:, 1, 2] = 120.0

    # candidates: every object seen in every view, gt + small noise
    poses, view_ids, obj_ids = [], [], []
    for v in range(n_views):
        for o in range(n_objects):
            TCO = np.linalg.inv(TWC[v]) @ TWO[o]
            noise = np.eye(4)
            noise[:3, :3] = ScipyRot.from_rotvec(
                rng.normal(0, 0.01, 3)
            ).as_matrix()
            noise[:3, 3] = rng.normal(0, 0.002, 3)
            poses.append(TCO @ noise)
            view_ids.append(v)
            obj_ids.append(o)
    # one garbage outlier (same label as object 0, wrong place)
    T_bad = np.eye(4)
    T_bad[:3, 3] = [0.5, 0.5, 2.0]
    poses.append(T_bad)
    view_ids.append(0)
    obj_ids.append(0)

    cands = MultiviewCandidates(
        poses=np.asarray(poses, np.float32),
        view_ids=np.asarray(view_ids),
        obj_ids=np.asarray(obj_ids),
        scores=np.ones(len(poses), np.float32),
        K=K,
    )
    return dict(db=db, bm=bm, cands=cands, TWO=TWO, TWC=TWC, K=K)


def test_matching_groups_objects(scene):
    out = multiview_candidate_matching(
        scene["cands"], scene["bm"], n_ransac_iter=30, dist_threshold=0.02,
        n_min_inliers=2, seed=0,
    )
    comp = out["component_ids"]
    n_cand = len(scene["cands"])
    # the outlier (last candidate) is unmatched
    assert comp[-1] == -1
    # the 9 true candidates form 3 components of 3, each uniform in obj
    true_comp = comp[:-1]
    assert (true_comp >= 0).all()
    obj_ids = np.asarray(scene["cands"].obj_ids[:-1])
    for c in np.unique(true_comp):
        members = np.where(true_comp == c)[0]
        assert len(members) == 3
        assert len(set(obj_ids[members].tolist())) == 1

    # relative camera poses recovered
    assert len(out["view_pairs"]) > 0
    TWC = scene["TWC"]
    for (v1, v2), T in zip(out["view_pairs"], out["TC1C2"]):
        T_gt = np.linalg.inv(TWC[v1]) @ TWC[v2]
        np.testing.assert_allclose(T[:3, 3], T_gt[:3, 3], atol=0.02)
        np.testing.assert_allclose(T[:3, :3], T_gt[:3, :3], atol=0.05)


def test_matching_known_cameras(scene):
    out = multiview_candidate_matching(
        scene["cands"], scene["bm"], dist_threshold=0.02, n_min_inliers=2,
        known_TWC=scene["TWC"],
    )
    comp = out["component_ids"]
    assert comp[-1] == -1
    assert (comp[:-1] >= 0).all()


def test_bundle_adjustment_recovers_scene(scene):
    match = multiview_candidate_matching(
        scene["cands"], scene["bm"], n_ransac_iter=30, dist_threshold=0.02,
        n_min_inliers=2, seed=0,
    )
    keep = match["component_ids"] >= 0
    cands = scene["cands"]
    # remap views to dense indices (already dense here)
    refiner = MultiviewRefinement(
        cand_TCO=cands.poses[keep],
        cand_view_idx=cands.view_ids[keep],
        cand_obj_idx=match["component_ids"][keep],
        cand_obj_ids=cands.obj_ids[keep],
        K=scene["K"],
        meshes=scene["bm"],
        n_points=8,
    )
    # map view-pair ids: matching returns original view ids == dense here
    result = refiner.solve(
        match["view_pairs"], match["TC1C2"], n_iterations=30,
    )
    assert np.isfinite(result["loss"])
    # reprojection loss small (residuals in pixels^2)
    assert result["loss"] < 5.0, result["loss"]

    # relative camera geometry recovered up to gauge: compare pairwise
    TWC_est = result["TWC"]
    TWC_gt = scene["TWC"]
    T01_est = np.linalg.inv(TWC_est[0]) @ TWC_est[1]
    T01_gt = np.linalg.inv(TWC_gt[0]) @ TWC_gt[1]
    np.testing.assert_allclose(T01_est[:3, 3], T01_gt[:3, 3], atol=0.02)

    # object-camera consistency: TCO from estimate close to candidates
    comp = match["component_ids"][keep]
    v_idx = cands.view_ids[keep]
    TCO_model = np.stack(
        [
            np.linalg.inv(TWC_est[v]) @ result["TWO"][o]
            for v, o in zip(v_idx, comp)
        ]
    )
    t_err = np.linalg.norm(
        TCO_model[:, :3, 3] - cands.poses[keep][:, :3, 3], axis=-1
    )
    assert t_err.max() < 0.03, t_err


def test_scene_predictor_end_to_end(scene):
    """MultiviewScenePredictor: candidates -> matched scene state -> per-view
    reprojections close to the original candidates."""
    from happypose_tpu.multiview.scene_predictor import MultiviewScenePredictor

    pred = MultiviewScenePredictor(
        scene["bm"], score_th=0.5, n_ransac_iter=30, dist_threshold=0.02,
        n_min_inliers=2, ba_n_iterations=25,
    )
    state = pred.predict_scene_state(scene["cands"], scene["K"])
    assert state is not None
    assert state.TWO.shape[0] == 3  # three physical objects
    assert sorted(state.obj_ids.tolist()) == [0, 1, 2]
    per_view = state.predictions_per_view()
    assert set(per_view.keys()) == {0, 1, 2}
    # reprojected predictions close to the noisy candidates
    cands = scene["cands"]
    v0 = per_view[0]
    for o in range(3):
        # find the candidate for object obj_ids[o] in view 0
        ci = np.where(
            (cands.view_ids == 0) & (cands.obj_ids == v0["obj_ids"][o])
        )[0][0]
        t_err = np.linalg.norm(
            v0["TCO"][o][:3, 3] - cands.poses[ci][:3, 3]
        )
        assert t_err < 0.05, t_err
