"""End-to-end pipeline tests on synthetic scenes (mirrors the reference's
integration-test strategy, tests/test_megapose_inference.py /
test_cosypose_inference.py, with our own renderer as the scene generator).

The scene: render an object at a known ground-truth pose, feed the image +
gt-derived detection box to the pipelines. With untrained (identity-update)
models, the refiner must preserve the init and the plumbing must produce
correctly-shaped, internally-consistent estimates; the coarse classifier
path must score all D x M hypotheses and select top-k per detection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from happypose_tpu.inference import (
    DetectionBatch,
    InferenceConfig,
    ObservationBatch,
    PoseEstimator,
)
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.models import PosePredictor, PosePredictorConfig
from happypose_tpu.ops.rasterizer import render_batch
from happypose_tpu.lib3d.rotations import log_SE3_norm


@pytest.fixture(scope="module")
def scene():
    db = MeshDataBase(
        meshes={
            "sphere": make_uv_sphere(radius=0.05, n_lat=12, n_lon=16),
            "box": make_box_mesh((0.04, 0.03, 0.05)),
        }
    )
    assets = db.render_assets()
    bm = db.batched(n_points=300)
    H, W = 120, 160
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 200.0
    K[0, 2] = W / 2
    K[1, 2] = H / 2
    TCO_gt = np.eye(4, dtype=np.float32)
    TCO_gt[:3, 3] = [0.02, -0.01, 0.45]
    out = render_batch(
        assets,
        jnp.asarray([db.id_of("box")], jnp.int32),
        jnp.asarray(TCO_gt)[None],
        jnp.asarray(K)[None],
        resolution=(H, W),
    )
    rgb = np.asarray(out.rgb[0])  # [H, W, 3]
    mask = np.asarray(out.mask[0])
    ys, xs = np.where(mask)
    box = np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)
    obs = ObservationBatch.from_numpy(
        (rgb * 255).astype(np.uint8), K
    )
    det = DetectionBatch.from_numpy(
        boxes=box[None], obj_ids=np.array([db.id_of("box")])
    )
    return dict(
        db=db, assets=assets, bm=bm, obs=obs, det=det, TCO_gt=TCO_gt, K=K,
        H=H, W=W,
    )


def _make_models(scene, coarse_classifier: bool):
    render_size = (60, 80)
    ref_cfg = PosePredictorConfig(
        backbone="wide_resnet18", render_size=render_size, renderer="reference"
    )
    refiner = PosePredictor(ref_cfg)
    obs, det, bm, assets = scene["obs"], scene["det"], scene["bm"], scene["assets"]
    meshes = bm.select(det.obj_ids)
    TCO0 = jnp.eye(4)[None].at[:, 2, 3].set(0.5)
    rv = refiner.init(
        jax.random.PRNGKey(0), obs.images, obs.K, det.obj_ids, TCO0, assets,
        meshes,
    )
    if coarse_classifier:
        c_cfg = PosePredictorConfig(
            backbone="wide_resnet18", render_size=render_size,
            renderer="reference", predict_pose_update=False,
            predict_rendered_views_logits=True,
        )
        coarse = PosePredictor(c_cfg)
        cv = coarse.init(
            jax.random.PRNGKey(1), obs.images, obs.K, det.obj_ids, TCO0,
            assets, meshes,
        )
        return (refiner, rv), (coarse, cv)
    return (refiner, rv), None


def test_cosypose_pipeline(scene):
    (refiner, rv), _ = _make_models(scene, coarse_classifier=False)
    cfg = InferenceConfig(n_refiner_iterations=2, bsz_objects=2)
    est = PoseEstimator(
        refiner=(refiner, rv), coarse=None, assets=scene["assets"],
        meshes=scene["bm"], cfg=cfg,
    )
    results = est.run_inference_pipeline(scene["obs"], scene["det"])
    final = results["final"]
    assert final.poses.shape[0] == 1
    assert bool(final.valid[0])
    # init was zup-autodepth on the gt box; identity-update refiner keeps it
    # close; check depth is in the right ballpark of gt (0.45)
    z = float(final.poses[0, 2, 3])
    assert 0.3 < z < 0.7, z
    # untrained refiner output ~ its input
    d = log_SE3_norm(results["init"].poses, final.poses)
    assert float(np.asarray(d)[0]) < 0.1


def test_megapose_pipeline(scene):
    (refiner, rv), (coarse, cv) = _make_models(scene, coarse_classifier=True)
    cfg = InferenceConfig(
        n_refiner_iterations=1, SO3_grid_size=16, bsz_images=8, bsz_objects=2,
        n_pose_hypotheses=2,
    )
    est = PoseEstimator(
        refiner=(refiner, rv), coarse=(coarse, cv), assets=scene["assets"],
        meshes=scene["bm"], cfg=cfg,
    )
    results = est.run_inference_pipeline(scene["obs"], scene["det"])
    coarse_est = results["coarse"]
    assert coarse_est.n_rows == 16  # D=1 x M=16
    assert bool(coarse_est.valid.all())
    assert np.isfinite(np.asarray(coarse_est.coarse_logits)).all()
    final = results["final"]
    n_final = int(np.asarray(final.valid).sum())
    assert n_final == 1  # top-1 per detection
    # the selected hypothesis must be among the top-2 coarse logits (the
    # untrained scorer gives equal-ish logits; just check bookkeeping)
    scored = results["scored"]
    assert int(np.asarray(scored.valid).sum()) == 2  # D * n_pose_hypotheses


def test_megapose_multiple_detections(scene):
    (refiner, rv), (coarse, cv) = _make_models(scene, coarse_classifier=True)
    cfg = InferenceConfig(
        n_refiner_iterations=1, SO3_grid_size=8, bsz_images=8, bsz_objects=2,
        n_pose_hypotheses=1,
    )
    db = scene["db"]
    det2 = DetectionBatch.from_numpy(
        boxes=np.array(
            [[60, 40, 100, 80], [30, 30, 70, 70]], np.float32
        ),
        obj_ids=np.array([db.id_of("box"), db.id_of("sphere")]),
    )
    est = PoseEstimator(
        refiner=(refiner, rv), coarse=(coarse, cv), assets=scene["assets"],
        meshes=scene["bm"], cfg=cfg,
    )
    results = est.run_inference_pipeline(scene["obs"], det2)
    final = results["final"]
    # one winner per detection
    assert int(np.asarray(final.valid).sum()) == 2
    winners = np.asarray(final.obj_ids)[np.asarray(final.valid)]
    assert set(winners.tolist()) == {db.id_of("box"), db.id_of("sphere")}


def test_megapose_pipeline_jit_matches_eager(scene):
    """The whole-pipeline jit (one XLA program per frame shape) must be
    numerically identical to the eager orchestration it wraps."""
    (refiner, rv), (coarse, cv) = _make_models(scene, coarse_classifier=True)
    cfg = InferenceConfig(
        n_refiner_iterations=1, SO3_grid_size=8, bsz_images=8, bsz_objects=2,
        n_pose_hypotheses=2,
    )
    est = PoseEstimator(
        refiner=(refiner, rv), coarse=(coarse, cv), assets=scene["assets"],
        meshes=scene["bm"], cfg=cfg,
    )
    eager = est.run_inference_pipeline(scene["obs"], scene["det"])
    jitted = est.run_inference_pipeline_jit(scene["obs"], scene["det"])
    assert set(eager) == set(jitted)
    for k in ("coarse", "final", "scored"):
        np.testing.assert_allclose(
            np.asarray(eager[k].poses), np.asarray(jitted[k].poses),
            rtol=1e-5, atol=1e-5,
        )
        assert (
            np.asarray(eager[k].valid) == np.asarray(jitted[k].valid)
        ).all()
    # second call with the same shapes must hit the jit cache
    assert len(est._pipeline_jit_cache) == 1
    est.run_inference_pipeline_jit(scene["obs"], scene["det"])
    assert len(est._pipeline_jit_cache) == 1


@pytest.mark.slow
def test_load_named_model_registry(scene, monkeypatch):
    """NAMED_MODELS -> working estimator end-to-end (tiny grid)."""
    import dataclasses
    from happypose_tpu.utils import load_model as lm

    spec = lm.NAMED_MODELS["megapose-RGB"]
    small = dataclasses.replace(
        spec,
        refiner_cfg=dataclasses.replace(
            spec.refiner_cfg, backbone="wide_resnet18", render_size=(60, 80),
            renderer="reference",
        ),
        coarse_cfg=dataclasses.replace(
            spec.coarse_cfg, backbone="wide_resnet18", render_size=(60, 80),
            renderer="reference",
        ),
        inference_cfg=dataclasses.replace(
            spec.inference_cfg, SO3_grid_size=8, bsz_images=8,
            n_refiner_iterations=1, n_pose_hypotheses=1, bsz_objects=2,
        ),
    )
    monkeypatch.setitem(lm.NAMED_MODELS, "megapose-RGB-test", small)
    est = lm.load_named_model(
        "megapose-RGB-test", scene["db"], n_points=64
    )
    results = est.run_inference_pipeline(scene["obs"], scene["det"])
    assert int(np.asarray(results["final"].valid).sum()) == 1
