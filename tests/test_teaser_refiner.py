"""GNC-TLS robust registration refiner (TEASER++-equivalent) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from happypose_tpu.inference.teaser_refiner import (
    TeaserRefiner,
    farthest_point_sample,
    gnc_tls_registration,
    weighted_procrustes,
)
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.ops.rasterizer import render_batch


def _rand_T(rs, rot_scale=0.3, t_scale=0.05):
    aa = rs.randn(3) * rot_scale
    angle = np.linalg.norm(aa)
    ax = aa / max(angle, 1e-9)
    Kx = np.array(
        [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
    )
    R = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * Kx @ Kx
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = rs.randn(3) * t_scale
    return T


class TestProcrustes:
    def test_exact_recovery(self):
        rs = np.random.RandomState(0)
        src = rs.randn(50, 3).astype(np.float32)
        T = _rand_T(rs)
        dst = src @ T[:3, :3].T + T[:3, 3]
        R, t = weighted_procrustes(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(50)
        )
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-5)

    def test_weights_ignore_outliers(self):
        rs = np.random.RandomState(1)
        src = rs.randn(40, 3).astype(np.float32)
        T = _rand_T(rs)
        dst = src @ T[:3, :3].T + T[:3, 3]
        dst[:10] += 5.0  # corrupted
        w = jnp.asarray(np.r_[np.zeros(10), np.ones(30)], jnp.float32)
        R, t = weighted_procrustes(jnp.asarray(src), jnp.asarray(dst), w)
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-5)


class TestGncTls:
    def test_clean_correspondences(self):
        rs = np.random.RandomState(2)
        src = rs.randn(200, 3).astype(np.float32) * 0.05
        T = _rand_T(rs)
        dst = src @ T[:3, :3].T + T[:3, 3]
        T_est, n_inl = gnc_tls_registration(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(200, bool)
        )
        np.testing.assert_allclose(np.asarray(T_est), T, atol=1e-4)
        assert int(n_inl) == 200

    def test_40pct_outliers(self):
        rs = np.random.RandomState(3)
        n, n_out = 300, 120
        src = rs.randn(n, 3).astype(np.float32) * 0.05
        T = _rand_T(rs, rot_scale=0.5)
        dst = src @ T[:3, :3].T + T[:3, 3]
        dst += rs.randn(n, 3).astype(np.float32) * 0.001  # inlier noise
        dst[:n_out] = rs.randn(n_out, 3).astype(np.float32) * 0.2  # outliers
        T_est, n_inl = gnc_tls_registration(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(n, bool),
            noise_bound=0.01,
        )
        # rotation within ~1 degree, translation within 5mm
        dR = np.asarray(T_est)[:3, :3].T @ T[:3, :3]
        ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0
        assert np.linalg.norm(np.asarray(T_est)[:3, 3] - T[:3, 3]) < 5e-3
        assert int(n_inl) >= n - n_out - 10

    def test_invalid_mask_respected(self):
        rs = np.random.RandomState(4)
        src = rs.randn(100, 3).astype(np.float32) * 0.05
        T = _rand_T(rs)
        dst = src @ T[:3, :3].T + T[:3, 3]
        dst[50:] = 99.0  # garbage, but masked out
        valid = jnp.asarray(np.r_[np.ones(50), np.zeros(50)].astype(bool))
        T_est, n_inl = gnc_tls_registration(
            jnp.asarray(src), jnp.asarray(dst), valid
        )
        np.testing.assert_allclose(np.asarray(T_est), T, atol=1e-4)
        assert int(n_inl) == 50


class TestFPS:
    def test_spreads_and_respects_mask(self):
        rs = np.random.RandomState(5)
        pts = np.zeros((100, 3), np.float32)
        pts[:, 0] = np.linspace(0, 1, 100)
        valid = np.zeros(100, bool)
        valid[10:90] = True
        idx = np.asarray(
            farthest_point_sample(
                jnp.asarray(pts), jnp.asarray(valid), 8, jax.random.PRNGKey(0)
            )
        )
        assert valid[idx].all()
        # farthest-point picks should cover the valid extent
        assert pts[idx, 0].max() - pts[idx, 0].min() > 0.6


class TestRefinerEndToEnd:
    def test_recovers_perturbed_pose(self):
        db = MeshDataBase(meshes={
            "sphere": make_uv_sphere(0.05, 16, 24),
            "box": make_box_mesh((0.04, 0.03, 0.05)),
        })
        assets = db.render_assets()
        K = jnp.asarray(
            [[[160.0, 0, 64.0], [0, 160.0, 48.0], [0, 0, 1.0]]] * 2
        )
        T_gt = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
        T_gt[:, 2, 3] = 0.45
        T_gt[1, 0, 3] = 0.02
        ids = jnp.asarray([0, 1], jnp.int32)
        obs = render_batch(
            assets, ids, jnp.asarray(T_gt), K, resolution=(96, 128)
        )
        T0 = T_gt.copy()
        T0[:, 0, 3] += 0.012
        T0[:, 2, 3] += 0.015
        ref = TeaserRefiner(
            assets, render_batch, resolution=(96, 128), n_points=256,
            min_num_inliers=30, n_outer_iterations=3,
        )
        T_ref = np.asarray(
            ref.refine(ids, jnp.asarray(T0), K, obs.depth)
        )
        err0 = np.linalg.norm(T0[:, :3, 3] - T_gt[:, :3, 3], axis=-1)
        err1 = np.linalg.norm(T_ref[:, :3, 3] - T_gt[:, :3, 3], axis=-1)
        # all instances improve; the box (flat faces -> unambiguous
        # same-pixel correspondences) converges to sub-mm. The sphere's
        # residual is inherent to pixel-fixed correspondences on curved
        # geometry (the reference's single-solve TEASER++ path shares it).
        assert (err1 < err0).all()
        assert err1[1] < 5e-4

    def test_no_depth_overlap_keeps_pose(self):
        db = MeshDataBase(meshes={"box": make_box_mesh((0.04, 0.03, 0.05))})
        assets = db.render_assets()
        K = jnp.asarray([[[160.0, 0, 64.0], [0, 160.0, 48.0], [0, 0, 1.0]]])
        T0 = np.eye(4, dtype=np.float32)[None].copy()
        T0[:, 2, 3] = 0.45
        ref = TeaserRefiner(assets, render_batch, resolution=(96, 128))
        empty = jnp.zeros((1, 96, 128))
        T_ref = np.asarray(ref.refine(jnp.asarray([0]), jnp.asarray(T0), K, empty))
        np.testing.assert_allclose(T_ref, T0, atol=1e-7)
