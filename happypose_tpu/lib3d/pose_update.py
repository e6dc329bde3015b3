"""SE(3) pose update from network outputs (pure JAX).

Parity target: /root/reference/happypose/toolbox/lib3d/cosypose_ops.py:34-62
(`pose_update_with_reference_point`) — the DeepIM-style disentangled update:
image-space translation (vx, vy) in focal-normalized units, multiplicative
depth update vz, and a rotation applied about the anchor point tCR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.transforms import make_T


def pose_update_with_reference_point(
    TCO: jax.Array,
    K: jax.Array,
    vxvyvz: jax.Array,
    dRCO: jax.Array,
    tCR: jax.Array,
) -> jax.Array:
    """Apply the (vx, vy, vz, dR) update about the reference point.

    Args:
      TCO: [B, 4, 4] current pose.
      K: [B, 3, 3] crop intrinsics.
      vxvyvz: [B, 3] network translation outputs.
      dRCO: [B, 3, 3] network rotation update (camera frame).
      tCR: [B, 3] reference point in camera frame.
    Returns:
      [B, 4, 4] updated pose.
    """
    zsrc = tCR[:, 2:3]
    vz = vxvyvz[:, 2:3]
    ztgt = vz * zsrc

    vxvy = vxvyvz[:, 0:2]
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], axis=-1)
    xsrcysrc = tCR[:, 0:2]
    tCR_out_xy = (vxvy / fxfy + xsrcysrc / zsrc) * ztgt
    tCR_out = jnp.concatenate([tCR_out_xy, ztgt], axis=-1)

    tCO_out = (
        jnp.squeeze(dRCO @ (TCO[:, :3, 3] - tCR)[..., None], -1) + tCR_out
    )
    R_out = dRCO @ TCO[:, :3, :3]
    return make_T(R_out, tCO_out, dtype=TCO.dtype)


def apply_imagespace_predictions(
    TCO: jax.Array, K: jax.Array, vxvyvz: jax.Array, dRCO: jax.Array
) -> jax.Array:
    """CosyPose variant: anchor is the object origin itself (tCR == tCO)."""
    return pose_update_with_reference_point(TCO, K, vxvyvz, dRCO, TCO[:, :3, 3])
