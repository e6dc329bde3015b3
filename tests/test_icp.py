"""ICP refiner: a known small SE(3) offset between rendered and observed
depth must be recovered."""

import numpy as np
import jax
import jax.numpy as jnp

from happypose_tpu.inference.icp_refiner import (
    ICPRefiner,
    backproject_depth,
    depth_normals,
    icp_point_to_plane,
)
from happypose_tpu.lib3d.rotations import log_SE3_norm
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.ops.rasterizer import render_batch


def test_backproject_round_trip():
    H, W = 32, 40
    K = jnp.asarray([[50.0, 0, 20], [0, 50.0, 16], [0, 0, 1]])
    depth = jnp.full((H, W), 0.5)
    pts, valid = backproject_depth(depth, K)
    assert bool(valid.all())
    # center pixel back-projects to the optical axis
    c = pts.reshape(H, W, 3)[16, 20]
    np.testing.assert_allclose(np.asarray(c), [0.005, 0.005, 0.5], atol=1e-2)


def test_normals_of_plane():
    H, W = 32, 40
    K = jnp.asarray([[50.0, 0, 20], [0, 50.0, 16], [0, 0, 1]])
    n = depth_normals(jnp.full((H, W), 0.5), K)
    inner = np.asarray(n[8:-8, 8:-8] @ jnp.asarray([0.0, 0.0, -1.0]))
    assert inner.min() > 0.99


def test_icp_recovers_offset():
    db = MeshDataBase(meshes={"box": make_box_mesh((0.04, 0.03, 0.05))})
    assets = db.render_assets()
    H, W = 120, 160
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 200.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    TCO_gt = jnp.eye(4).at[2, 3].set(0.45)
    # observed depth = render at gt
    obs = render_batch(
        assets, jnp.asarray([0]), TCO_gt[None], jnp.asarray(K)[None],
        resolution=(H, W),
    )
    # predicted pose = gt with small offset
    off = jnp.eye(4).at[0, 3].set(0.008).at[1, 3].set(-0.005).at[2, 3].set(0.45 + 0.01)
    refiner = ICPRefiner(
        assets, render_batch, resolution=(H, W), n_points=512,
        n_iterations=15, max_corr_dist=0.05,
    )
    TCO_ref = refiner.refine(
        jnp.asarray([0]), off[None], jnp.asarray(K)[None], obs.depth,
    )
    err_before = float(log_SE3_norm(off[None], TCO_gt[None])[0])
    err_after = float(log_SE3_norm(TCO_ref, TCO_gt[None])[0])
    assert err_after < err_before * 0.5, (err_before, err_after)
    assert err_after < 0.01


import pytest


@pytest.mark.parametrize(
    "refiner_name",
    ["icp", pytest.param("teaserpp", marks=pytest.mark.slow)],  # ~11 s
)
def test_pipeline_depth_refiner_integration(refiner_name):
    """run_inference_pipeline with run_depth_refiner=True must improve the
    final pose using the observed depth (both refiner backends)."""
    import dataclasses
    from happypose_tpu.inference import (
        DetectionBatch, InferenceConfig, ObservationBatch, PoseEstimator,
    )
    from happypose_tpu.models import PosePredictor, PosePredictorConfig

    db = MeshDataBase(meshes={"box": make_box_mesh((0.04, 0.03, 0.05))})
    assets = db.render_assets()
    bm = db.batched(n_points=128)
    H, W = 120, 160
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 200.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    TCO_gt = jnp.eye(4).at[2, 3].set(0.45)
    scene = render_batch(
        assets, jnp.asarray([0]), TCO_gt[None], jnp.asarray(K)[None],
        resolution=(H, W),
    )
    mask = np.asarray(scene.mask[0])
    ys, xs = np.where(mask)
    obs = ObservationBatch.from_numpy(
        (np.asarray(scene.rgb[0]) * 255).astype(np.uint8), K,
        depth=np.asarray(scene.depth[0]),
    )
    det = DetectionBatch.from_numpy(
        np.asarray([[xs.min(), ys.min(), xs.max(), ys.max()]], np.float32),
        np.asarray([0]),
    )
    cfg = PosePredictorConfig(
        backbone="wide_resnet18", render_size=(60, 80), renderer="reference",
    )
    model = PosePredictor(cfg)
    TCO0 = jnp.eye(4)[None].at[:, 2, 3].set(0.5)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), obs.images, obs.K, det.obj_ids, TCO0, assets,
        bm.select(det.obj_ids),
    )
    est = PoseEstimator(
        refiner=(model, variables), coarse=None, assets=assets, meshes=bm,
        cfg=InferenceConfig(
            n_refiner_iterations=1, bsz_objects=1, run_depth_refiner=True,
            depth_refiner=refiner_name,
        ),
    )
    results = est.run_inference_pipeline(obs, det)
    assert "depth_refined" in results
    # depth refinement moves the autodepth init toward gt depth
    z_no_icp = float(results["iteration=1"].poses[0, 2, 3])
    z_icp = float(results["final"].poses[0, 2, 3])
    assert abs(z_icp - 0.45) < abs(z_no_icp - 0.45) + 1e-6
    assert abs(z_icp - 0.45) < 0.02
