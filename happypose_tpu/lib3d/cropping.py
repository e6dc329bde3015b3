"""DeepIM-style dynamic crop boxes (pure JAX).

Parity target: /root/reference/happypose/toolbox/lib3d/cropping.py
(`deepim_boxes` :27, `deepim_crops` :78, `deepim_crops_robust` :113).

The crop box is centered on the projected anchor point, covers the union of
the observed and rendered boxes, is expanded by ``lamb`` and forced to the
image aspect ratio. Crops are taken with our own roi_align (same semantics as
torchvision's).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.camera import (
    boxes_from_uv,
    masked_boxes_from_uv,
    project_points,
    project_points_robust,
)
from happypose_tpu.ops.roi_align import crop_images


def deepim_boxes(
    rend_center_uv: jax.Array,
    obs_boxes: jax.Array,
    rend_boxes: jax.Array,
    lamb: float = 1.4,
    im_size: Tuple[int, int] = (240, 320),
) -> jax.Array:
    """Crop boxes around the projected anchor covering obs+rend boxes.

    Args:
      rend_center_uv: [B, 1, 2] projected anchor pixel.
      obs_boxes: [B, 4]; rend_boxes: [B, 4].
      im_size: (h, w) — fixes the target aspect ratio.
    Returns:
      [B, 4] (x1, y1, x2, y2), unclamped (can exceed the image, as in ref).
    """
    xc = rend_center_uv[:, 0, 0]
    yc = rend_center_uv[:, 0, 1]
    w = float(max(im_size))
    h = float(min(im_size))
    r = w / h

    xdist = jnp.max(
        jnp.stack(
            [
                jnp.abs(obs_boxes[:, 0] - xc),
                jnp.abs(rend_boxes[:, 0] - xc),
                jnp.abs(obs_boxes[:, 2] - xc),
                jnp.abs(rend_boxes[:, 2] - xc),
            ],
            axis=1,
        ),
        axis=1,
    )
    ydist = jnp.max(
        jnp.stack(
            [
                jnp.abs(obs_boxes[:, 1] - yc),
                jnp.abs(rend_boxes[:, 1] - yc),
                jnp.abs(obs_boxes[:, 3] - yc),
                jnp.abs(rend_boxes[:, 3] - yc),
            ],
            axis=1,
        ),
        axis=1,
    )
    width = jnp.maximum(xdist, ydist * r) * 2 * lamb
    height = jnp.maximum(xdist / r, ydist) * 2 * lamb
    return jnp.stack(
        [xc - width / 2, yc - height / 2, xc + width / 2, yc + height / 2], axis=1
    )


def deepim_crops(
    images: jax.Array,
    obs_boxes: jax.Array,
    K: jax.Array,
    TCO_pred: jax.Array,
    O_vertices: jax.Array,
    output_size: Optional[Tuple[int, int]] = None,
    lamb: float = 1.4,
    points_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """CosyPose crop: anchor = projected object origin. Returns (boxes, crops)."""
    B, _, h, w = images.shape
    output_size = output_size or (h, w)
    uv = project_points(O_vertices, K, TCO_pred)
    if points_mask is not None:
        rend_boxes = masked_boxes_from_uv(uv, points_mask)
    else:
        rend_boxes = boxes_from_uv(uv)
    center = project_points(jnp.zeros((B, 1, 3), images.dtype), K, TCO_pred)
    boxes = deepim_boxes(center, obs_boxes, rend_boxes, lamb=lamb, im_size=(h, w))
    crops = crop_images(images, boxes, output_size=output_size, sampling_ratio=4)
    return boxes, crops


def deepim_crops_robust(
    images: jax.Array,
    obs_boxes: jax.Array,
    K: jax.Array,
    TCO_pred: jax.Array,
    tCR_in: jax.Array,
    O_vertices: jax.Array,
    output_size: Optional[Tuple[int, int]] = None,
    lamb: float = 1.4,
    return_crops: bool = True,
    points_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """MegaPose crop: anchor = reference point tCR; z-clamped projections."""
    B = TCO_pred.shape[0]
    _, _, h, w = images.shape
    output_size = output_size or (h, w)
    uv = project_points_robust(O_vertices, K, TCO_pred)
    if points_mask is not None:
        rend_boxes = masked_boxes_from_uv(uv, points_mask)
    else:
        rend_boxes = boxes_from_uv(uv)
    TCR = TCO_pred.at[:, :3, 3].set(tCR_in)
    center = project_points_robust(jnp.zeros((B, 1, 3), images.dtype), K, TCR)
    boxes = deepim_boxes(center, obs_boxes, rend_boxes, lamb=lamb, im_size=(h, w))
    crops = None
    if return_crops:
        crops = crop_images(images, boxes, output_size=output_size, sampling_ratio=4)
    return boxes, crops
