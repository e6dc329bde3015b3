"""ROI-align (bilinear crop+resize) in pure JAX.

Matches torchvision.ops.roi_align semantics with ``aligned=False`` and a
fixed ``sampling_ratio`` — the exact call used by the reference's crop path
(/root/reference/happypose/toolbox/lib3d/cropping.py:155-197) — so that crops
fed to the CNN line up with the reference's training distribution.

One ROI per image row (the pose pipelines always crop image i with box i), so
there is no gather over a ragged roi->image map; everything stays dense and
static-shaped for XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_gather(image: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample image [C, H, W] at float coords ys/xs [N] with torchvision's
    border rule: points outside (-1, H) x (-1, W) contribute 0; inside points
    are clamped to the valid range before interpolation."""
    C, H, W = image.shape
    valid = (ys > -1.0) & (ys < H) & (xs > -1.0) & (xs < W)
    y = jnp.clip(ys, 0.0, H - 1)
    x = jnp.clip(xs, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx
    # [C, N] gathers
    flat = image.reshape(C, H * W)
    g = lambda yy, xx: flat[:, yy * W + xx]
    val = (
        g(y0, x0) * (hy * hx)
        + g(y0, x1) * (hy * lx)
        + g(y1, x0) * (ly * hx)
        + g(y1, x1) * (ly * lx)
    )
    return jnp.where(valid[None, :], val, 0.0)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    images: jax.Array,
    boxes: jax.Array,
    output_size: tuple,
    sampling_ratio: int = 4,
) -> jax.Array:
    """Crop + resize with bilinear sampling.

    Args:
      images: [B, C, H, W].
      boxes: [B, 4] (x1, y1, x2, y2) in pixels; ROI i crops image i.
      output_size: (out_h, out_w), static.
      sampling_ratio: samples per bin edge, static.
    Returns:
      [B, C, out_h, out_w].
    """
    out_h, out_w = output_size
    s = sampling_ratio

    def crop_one(image, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        roi_w = x2 - x1
        roi_h = y2 - y1
        bin_w = roi_w / out_w
        bin_h = roi_h / out_h
        # sample positions: y1 + (ph*s + iy + 0.5) * bin_h / s
        gy = y1 + (jnp.arange(out_h * s, dtype=images.dtype) + 0.5) * (bin_h / s)
        gx = x1 + (jnp.arange(out_w * s, dtype=images.dtype) + 0.5) * (bin_w / s)
        ys = jnp.repeat(gy, out_w * s)
        xs = jnp.tile(gx, out_h * s)
        vals = _bilinear_gather(image, ys, xs)  # [C, (out_h*s)*(out_w*s)]
        vals = vals.reshape(-1, out_h, s, out_w, s)
        return vals.mean(axis=(2, 4))

    return jax.vmap(crop_one)(images, boxes)


def crop_images(
    images: jax.Array,
    boxes: jax.Array,
    output_size: tuple,
    sampling_ratio: int = 4,
) -> jax.Array:
    """RGB(+depth) crop. If a 4th channel (depth) is present, invalidate
    interpolated depth pixels that mixed valid and invalid (==0) sources,
    mirroring cropping.py:155-197 in the reference."""
    nchannels = images.shape[1]
    crops = roi_align(images, boxes, output_size, sampling_ratio)
    if nchannels == 4:
        depth_valid = (images[:, 3:4] > 0).astype(images.dtype)
        valid_crop = roi_align(depth_valid, boxes, output_size, sampling_ratio)
        mask = (valid_crop >= 0.99).astype(images.dtype)
        crops = crops.at[:, 3:4].multiply(mask)
    return crops
