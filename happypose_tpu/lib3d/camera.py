"""Pinhole camera geometry (pure JAX).

Parity targets: /root/reference/happypose/toolbox/lib3d/camera_geometry.py
(`project_points` :23, `project_points_robust` :40, `boxes_from_uv` :59,
`get_K_crop_resize` :70, `cropresize_backtransform_points2d` :125).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def project_points(points_3d: jax.Array, K: jax.Array, TCO: jax.Array) -> jax.Array:
    """Project object-frame points through TCO and intrinsics K.

    Args:
      points_3d: [B, P, 3].
      K: [B, 3, 3].
      TCO: [B, 4, 4].
    Returns:
      uv: [B, P, 2] pixel coordinates.
    """
    cam_pts = (
        jnp.einsum("bij,bpj->bpi", TCO[:, :3, :3], points_3d) + TCO[:, None, :3, 3]
    )
    suv = jnp.einsum("bij,bpj->bpi", K, cam_pts)
    return suv[..., :2] / suv[..., 2:3]


def project_points_robust(
    points_3d: jax.Array, K: jax.Array, TCO: jax.Array, z_min: float = 0.1
) -> jax.Array:
    """Like `project_points` but clamps depth at z_min to avoid blow-ups for
    points behind / near the camera plane."""
    cam_pts = (
        jnp.einsum("bij,bpj->bpi", TCO[:, :3, :3], points_3d) + TCO[:, None, :3, 3]
    )
    suv = jnp.einsum("bij,bpj->bpi", K, cam_pts)
    z = jnp.maximum(suv[..., 2:3], z_min)
    return suv[..., :2] / z


def boxes_from_uv(uv: jax.Array) -> jax.Array:
    """Tight (xmin, ymin, xmax, ymax) boxes over point sets [B, P, 2] -> [B, 4]."""
    mins = jnp.min(uv, axis=1)
    maxs = jnp.max(uv, axis=1)
    return jnp.concatenate([mins, maxs], axis=-1)


def masked_boxes_from_uv(uv: jax.Array, mask: jax.Array) -> jax.Array:
    """Boxes over valid points only; mask [B, P] bool. Invalid points are
    excluded via +-inf sentinels (needed for padded mesh point sets)."""
    big = jnp.asarray(jnp.inf, uv.dtype)
    mins = jnp.min(jnp.where(mask[..., None], uv, big), axis=1)
    maxs = jnp.max(jnp.where(mask[..., None], uv, -big), axis=1)
    return jnp.concatenate([mins, maxs], axis=-1)


def get_K_crop_resize(
    K: jax.Array,
    boxes: jax.Array,
    orig_size: Tuple[int, int],
    crop_resize: Tuple[int, int],
) -> jax.Array:
    """Intrinsics of the virtual camera after crop `boxes` + resize.

    Pixel-center convention identical to the reference (camera_geometry.py:70-123):
    principal point moves by (box size - 1)/2 during crop, then scales about the
    resized image center. Skew unhandled.

    Args:
      K: [B, 3, 3]; boxes: [B, 4] (x1, y1, x2, y2).
      orig_size: (h, w) of the source image (unused in the math, kept for parity).
      crop_resize: (h, w) of the output crop.
    """
    del orig_size
    final_width = float(max(crop_resize))
    final_height = float(min(crop_resize))
    crop_w = boxes[:, 2] - boxes[:, 0]
    crop_h = boxes[:, 3] - boxes[:, 1]
    crop_cj = (boxes[:, 0] + boxes[:, 2]) / 2
    crop_ci = (boxes[:, 1] + boxes[:, 3]) / 2

    cx = K[:, 0, 2] + (crop_w - 1) / 2 - crop_cj
    cy = K[:, 1, 2] + (crop_h - 1) / 2 - crop_ci

    scale_x = final_width / crop_w
    scale_y = final_height / crop_h
    fx = scale_x * K[:, 0, 0]
    fy = scale_y * K[:, 1, 1]
    cx = (final_width - 1) / 2 + scale_x * (cx - (crop_w - 1) / 2)
    cy = (final_height - 1) / 2 + scale_y * (cy - (crop_h - 1) / 2)

    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    new_K = jnp.stack(
        [fx, zeros, cx, zeros, fy, cy, zeros, zeros, ones], axis=-1
    ).reshape(-1, 3, 3)
    return new_K


def cropresize_backtransform_points2d(
    input_wh: jax.Array,
    boxes_2d_crop: jax.Array,
    output_wh: jax.Array,
    points_2d_in_output: jax.Array,
) -> jax.Array:
    """Map 2D points in a resized crop back to source-image pixels."""
    points_norm = points_2d_in_output / output_wh[:, None, :]
    return boxes_2d_crop[:, None, 0:2] + points_norm * input_wh[:, None, :]
