"""Pose initialization from 2D detection boxes (pure JAX).

Parity targets: /root/reference/happypose/toolbox/lib3d/cosypose_ops.py
(`TCO_init_from_boxes` :159, `TCO_init_from_boxes_autodepth_with_R` :184,
`TCO_init_from_boxes_zup_autodepth` :241).

Supports padded mesh point sets via an optional validity mask so that the
autodepth extent computation ignores padding points.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.transforms import transform_pts

# BOP20 z-up canonical orientation used for coarse init: object z-up, camera
# looking along -x of the object frame.
_ZUP = jnp.asarray(
    [[0.0, 1.0, 0.0, 0.0],
     [0.0, 0.0, -1.0, 0.0],
     [-1.0, 0.0, 0.0, 1.0],
     [0.0, 0.0, 0.0, 1.0]]
)


def TCO_init_from_boxes(z_range: Tuple[float, float], boxes: jax.Array, K: jax.Array) -> jax.Array:
    """Identity rotation, z = mean(z_range), xy from box center back-projection."""
    bsz = boxes.shape[0]
    z = jnp.full((bsz,), (z_range[0] + z_range[1]) / 2.0, dtype=boxes.dtype)
    uv_c = (boxes[:, 0:2] + boxes[:, 2:4]) / 2
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], axis=-1)
    cxcy = K[:, 0:2, 2]
    xy = (uv_c - cxcy) * z[:, None] / fxfy
    TCO = jnp.broadcast_to(jnp.eye(4, dtype=boxes.dtype), (bsz, 4, 4))
    TCO = TCO.at[:, 0:2, 3].set(xy)
    TCO = TCO.at[:, 2, 3].set(z)
    return TCO


def _autodepth(
    TCO: jax.Array,
    boxes_2d: jax.Array,
    model_points_3d: jax.Array,
    K: jax.Array,
    points_mask: Optional[jax.Array],
) -> jax.Array:
    """Depth from matching the camera-frame point-extent to the 2D box extent."""
    C_pts = transform_pts(TCO, model_points_3d)
    if points_mask is not None:
        big = jnp.asarray(jnp.inf, C_pts.dtype)
        m = points_mask[..., None]
        xmax = jnp.max(jnp.where(m, C_pts, -big)[:, :, 0], axis=1)
        xmin = jnp.min(jnp.where(m, C_pts, big)[:, :, 0], axis=1)
        ymax = jnp.max(jnp.where(m, C_pts, -big)[:, :, 1], axis=1)
        ymin = jnp.min(jnp.where(m, C_pts, big)[:, :, 1], axis=1)
    else:
        xmax, xmin = jnp.max(C_pts[:, :, 0], axis=1), jnp.min(C_pts[:, :, 0], axis=1)
        ymax, ymin = jnp.max(C_pts[:, :, 1], axis=1), jnp.min(C_pts[:, :, 1], axis=1)
    deltax_3d = xmax - xmin
    deltay_3d = ymax - ymin
    bb_dx = (boxes_2d[:, 2] - boxes_2d[:, 0]) + 1
    bb_dy = (boxes_2d[:, 3] - boxes_2d[:, 1]) + 1
    z_from_dx = K[:, 0, 0] * deltax_3d / bb_dx
    z_from_dy = K[:, 1, 1] * deltay_3d / bb_dy
    return (z_from_dx + z_from_dy) / 2


def TCO_init_from_boxes_autodepth_with_R(
    boxes_2d: jax.Array,
    model_points_3d: jax.Array,
    K: jax.Array,
    R: jax.Array,
    points_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """SO(3)-grid hypothesis init (MegaPose coarse): given R, depth chosen so
    the projected point extent matches the box; xy from box-center ray."""
    bsz = boxes_2d.shape[0]
    dtype = boxes_2d.dtype
    z_guess = 1.0
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], axis=-1)
    cxcy = K[:, 0:2, 2]
    bb_c = (boxes_2d[:, 0:2] + boxes_2d[:, 2:4]) / 2
    xy0 = (bb_c - cxcy) * z_guess / fxfy

    # build poses by concatenation, NOT .at[].set() into a broadcast_to
    # constant: that scatter pattern miscompiled under jit on CPU XLA
    # (finite set values came out inf — round-5 finding)
    from happypose_tpu.lib3d.transforms import make_T

    t0 = jnp.concatenate(
        [xy0, jnp.full((bsz, 1), z_guess, dtype)], axis=-1
    )
    TCO = make_T(jnp.broadcast_to(R, (bsz, 3, 3)), t0, dtype=dtype)

    z = _autodepth(TCO, boxes_2d, model_points_3d, K, points_mask)
    xy = (bb_c - cxcy) * z[:, None] / fxfy
    t = jnp.concatenate([xy, z[:, None]], axis=-1)
    return make_T(jnp.broadcast_to(R, (bsz, 3, 3)), t, dtype=dtype)


def TCO_init_from_boxes_zup_autodepth(
    boxes_2d: jax.Array,
    model_points_3d: jax.Array,
    K: jax.Array,
    points_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """BOP20 init: canonical z-up orientation + autodepth."""
    bsz = boxes_2d.shape[0]
    R = jnp.broadcast_to(_ZUP[:3, :3].astype(boxes_2d.dtype), (bsz, 3, 3))
    return TCO_init_from_boxes_autodepth_with_R(
        boxes_2d, model_points_3d, K, R, points_mask
    )
