"""SE(3) transform ops (pure JAX).

Parity targets (reference): /root/reference/happypose/toolbox/lib3d/transform_ops.py
(`transform_pts` :28, `invert_transform_matrices` :59, `add_noise` :70,
`compute_transform_from_pose9d` :107, `normalize_T` :118).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.rotations import euler_to_rotmat, rotmat_from_ortho6d


def transform_pts(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply rigid transform(s) to point sets.

    Args:
      T: [B, 4, 4] or [B, S, 4, 4] transforms.
      pts: [B, P, 3].
    Returns:
      [B, P, 3] or [B, S, P, 3].
    """
    if T.ndim == 4:
        # [B, S, 4, 4] x [B, 1, P, 3]
        return (
            jnp.einsum("bsij,bpj->bspi", T[..., :3, :3], pts) + T[..., None, :3, 3]
        )
    return jnp.einsum("bij,bpj->bpi", T[..., :3, :3], pts) + T[:, None, :3, 3]


def invert_transforms(T: jax.Array) -> jax.Array:
    """Invert rigid transforms [..., 4, 4] without a linear solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.squeeze(R_inv @ t[..., None], -1)
    return make_T(R_inv, t_inv, dtype=T.dtype)


def make_T(R: jax.Array, t: jax.Array, dtype=None) -> jax.Array:
    """Assemble [..., 4, 4] from R [..., 3, 3] and t [..., 3]."""
    dtype = dtype or R.dtype
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3)).astype(dtype)
    t = jnp.broadcast_to(t, batch + (3,)).astype(dtype)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def pose9d_to_T(pose9d: jax.Array) -> jax.Array:
    """[..., 9] = (ortho6d, txyz) -> [..., 4, 4]."""
    R = rotmat_from_ortho6d(pose9d[..., :6])
    return make_T(R, pose9d[..., 6:9])


def T_to_pose9d(T: jax.Array) -> jax.Array:
    """[..., 4, 4] -> [..., 9]: first two columns of R + translation."""
    return jnp.concatenate([T[..., :3, 0], T[..., :3, 1], T[..., :3, 3]], axis=-1)


def normalize_T(T: jax.Array) -> jax.Array:
    """Re-orthonormalize the rotation block via a 9D round-trip."""
    return pose9d_to_T(T_to_pose9d(T))


def add_pose_noise(
    key: jax.Array,
    TCO: jax.Array,
    euler_deg_std: Tuple[float, float, float] = (15.0, 15.0, 15.0),
    trans_std: Tuple[float, float, float] = (0.01, 0.01, 0.05),
) -> jax.Array:
    """Right-multiply gaussian SE(3) noise (refiner training input generator).

    Parity: transform_ops.py:70-105 in the reference, but driven by a JAX PRNG
    key instead of global numpy state.
    """
    bsz = TCO.shape[0]
    k1, k2 = jax.random.split(key)
    euler = (
        jax.random.normal(k1, (bsz, 3), dtype=TCO.dtype)
        * jnp.asarray(euler_deg_std, dtype=TCO.dtype)
        * (jnp.pi / 180.0)
    )
    trans = jax.random.normal(k2, (bsz, 3), dtype=TCO.dtype) * jnp.asarray(
        trans_std, dtype=TCO.dtype
    )
    R_noise = euler_to_rotmat(euler)
    R = TCO[:, :3, :3] @ R_noise
    t = TCO[:, :3, 3] + trans
    return make_T(R, t, dtype=TCO.dtype)
