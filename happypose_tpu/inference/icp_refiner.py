"""Depth-based ICP pose refinement (pure JAX, fixed shapes).

Parity target: /root/reference/happypose/pose_estimators/megapose/inference/
icp_refiner.py:135-303 (`ICPRefiner`: render depth at the predicted pose,
mask-erode, then point-to-plane ICP of rendered vs observed depth clouds;
the reference uses Open3D on CPU per instance).

TPU design: everything is a fixed-size batched computation — depth maps are
back-projected to fixed-count point sets (masked), observed-cloud normals
come from depth-image gradients, correspondences are dense nearest-neighbor
(masked [N, M] distances), and each iteration solves the 6x6 point-to-plane
normal equations on device. `lax.scan` over a fixed iteration count; no
per-instance host loop.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.rotations import axis_angle_to_rotmat
from happypose_tpu.lib3d.transforms import make_T


def backproject_depth(
    depth: jax.Array,  # [H, W]
    K: jax.Array,  # [3, 3]
) -> Tuple[jax.Array, jax.Array]:
    """Depth map -> camera-frame points [H*W, 3] + validity [H*W]."""
    H, W = depth.shape
    u = jnp.arange(W, dtype=depth.dtype)[None, :]
    v = jnp.arange(H, dtype=depth.dtype)[:, None]
    x = (u - K[0, 2]) / K[0, 0] * depth
    y = (v - K[1, 2]) / K[1, 1] * depth
    pts = jnp.stack(
        [x.reshape(-1), y.reshape(-1), depth.reshape(-1)], axis=-1
    )
    return pts, depth.reshape(-1) > 0


def depth_normals(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Camera-frame normals from depth-image gradients, [H, W, 3]."""
    H, W = depth.shape
    pts, _ = backproject_depth(depth, K)
    P = pts.reshape(H, W, 3)
    dx = jnp.roll(P, -1, axis=1) - jnp.roll(P, 1, axis=1)
    dy = jnp.roll(P, -1, axis=0) - jnp.roll(P, 1, axis=0)
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    # orient toward the camera
    return jnp.where(n[..., 2:3] > 0, -n, n)


def _subsample(pts: jax.Array, valid: jax.Array, n: int, key: jax.Array):
    """Pick n points, biased to valid ones (invalid padded & masked)."""
    score = valid.astype(jnp.float32) + jax.random.uniform(
        key, valid.shape, minval=0.0, maxval=0.5
    )
    _, idx = jax.lax.top_k(score, n)
    return pts[idx], valid[idx]


@partial(jax.jit, static_argnames=("n_iterations", "n_points"))
def icp_point_to_plane(
    src_pts: jax.Array,  # [N, 3] rendered cloud (model at predicted pose)
    src_valid: jax.Array,  # [N]
    tgt_pts: jax.Array,  # [M, 3] observed cloud
    tgt_normals: jax.Array,  # [M, 3]
    tgt_valid: jax.Array,  # [M]
    max_corr_dist: float = 0.02,
    n_iterations: int = 10,
    n_points: int = 512,
) -> jax.Array:
    """Returns dT [4, 4] aligning src -> tgt (apply as dT @ TCO)."""
    del n_points

    def residual_and_corr(T):
        R, t = T[:3, :3], T[:3, 3]
        src = src_pts @ R.T + t  # [N, 3]
        d2 = jnp.sum((src[:, None] - tgt_pts[None]) ** 2, axis=-1)
        big = jnp.asarray(jnp.inf, d2.dtype)
        d2 = jnp.where(src_valid[:, None] & tgt_valid[None, :], d2, big)
        nn = jnp.argmin(d2, axis=1)  # [N]
        nn_d = jnp.sqrt(jnp.min(d2, axis=1))
        w = (src_valid & (nn_d < max_corr_dist)).astype(src.dtype)
        q = tgt_pts[nn]
        n = tgt_normals[nn]
        res = jnp.sum(w * jnp.abs(jnp.sum(n * (src - q), -1))) / jnp.maximum(
            w.sum(), 1.0
        )
        return src, q, n, w, res

    def body(carry, _):
        T, best_T, best_res = carry
        src, q, n, w, _ = residual_and_corr(T)
        # point-to-plane linearization: find (w, v) minimizing
        # sum ((p x n) . w + n . v + n . (p - q))^2
        c = jnp.cross(src, n)  # [N, 3]
        A = jnp.concatenate([c, n], axis=-1)  # [N, 6]
        b = -jnp.sum(n * (src - q), axis=-1)  # [N]
        Aw = A * w[:, None]
        H6 = Aw.T @ A + 1e-6 * jnp.eye(6)
        g = Aw.T @ b
        x = jnp.linalg.solve(H6, g)
        dR = axis_angle_to_rotmat(x[None, :3])[0]
        dt = x[3:6]
        T_new = make_T(dR, dt) @ T
        # flat geometry lets ICP slide/rotate after convergence; keep the
        # lowest-residual iterate instead of the last one
        _, _, _, _, res_new = residual_and_corr(T_new)
        better = res_new < best_res
        best_T = jnp.where(better, T_new, best_T)
        best_res = jnp.minimum(res_new, best_res)
        return (T_new, best_T, best_res), None

    T0 = jnp.eye(4, dtype=src_pts.dtype)
    (_, best_T, _), _ = jax.lax.scan(
        body, (T0, T0, jnp.asarray(jnp.inf, src_pts.dtype)), None,
        length=n_iterations,
    )
    return best_T


class ICPRefiner:
    """Refine poses with observed depth (the reference's `run_depth_refiner`
    stage, megapose/inference/pose_estimator.py:497-513)."""

    def __init__(self, assets, renderer_fn, resolution=(120, 160),
                 n_points: int = 512, n_iterations: int = 10,
                 max_corr_dist: float = 0.02):
        self.assets = assets
        self.renderer_fn = renderer_fn  # (assets, ids, TCO, K, resolution)
        self.resolution = resolution
        self.n_points = n_points
        self.n_iterations = n_iterations
        self.max_corr_dist = max_corr_dist

    def refine(
        self,
        obj_ids: jax.Array,  # [B]
        TCO: jax.Array,  # [B, 4, 4]
        K: jax.Array,  # [B, 3, 3] (full-image intrinsics scaled to depth map)
        depth_obs: jax.Array,  # [B, H, W] observed depth (meters)
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Returns refined TCO [B, 4, 4]."""
        key = key if key is not None else jax.random.PRNGKey(0)
        render = self.renderer_fn(
            self.assets, obj_ids, TCO, K, resolution=self.resolution
        )

        def per_instance(depth_r, depth_o, K_i, T_i, k):
            src_all, src_v = backproject_depth(depth_r, K_i)
            tgt_all, tgt_v = backproject_depth(depth_o, K_i)
            nrm = depth_normals(depth_o, K_i).reshape(-1, 3)
            k1, k2 = jax.random.split(k)
            src, sv = _subsample(src_all, src_v, self.n_points, k1)
            idx_score = tgt_v.astype(jnp.float32) + jax.random.uniform(
                k2, tgt_v.shape, maxval=0.5
            )
            _, ti = jax.lax.top_k(idx_score, self.n_points)
            tgt, tv, tn = tgt_all[ti], tgt_v[ti], nrm[ti]
            dT = icp_point_to_plane(
                src, sv, tgt, tn, tv,
                max_corr_dist=self.max_corr_dist,
                n_iterations=self.n_iterations,
            )
            ok = sv.sum() > 32
            return jnp.where(ok, dT @ T_i, T_i)

        keys = jax.random.split(key, TCO.shape[0])
        return jax.vmap(per_instance)(render.depth, depth_obs, K, TCO, keys)
