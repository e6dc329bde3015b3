"""Pose training losses (pure JAX).

Parity targets:
- disentangled refiner loss with reference point:
  /root/reference/happypose/toolbox/lib3d/cosypose_ops.py:82-156
  (`loss_refiner_CO_disentangled_reference_point`)
- symmetric pose loss: cosypose_ops.py:65-79
- coarse-classifier BCE on rendering logits:
  megapose/training/megapose_forward_loss.py:168-241

The disentangled loss evaluates three hypothetical pose updates, each using
the ground-truth value for all but one of (rotation, image-space xy, depth),
so each network output gets an isolated gradient signal.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.distances import loss_CO_symmetric
from happypose_tpu.lib3d.pose_update import pose_update_with_reference_point
from happypose_tpu.lib3d.rotations import quat_to_rotmat, rotmat_from_ortho6d


def loss_refiner_CO_disentangled_reference_point(
    TCO_possible_gt: jax.Array,  # [B, S, 4, 4] symmetry-expanded GT
    TCO_input: jax.Array,  # [B, 4, 4]
    refiner_outputs: jax.Array,  # [B, 9]
    K_crop: jax.Array,  # [B, 3, 3]
    points: jax.Array,  # [B, P, 3]
    tCR: jax.Array,  # [B, 3]
    points_mask: Optional[jax.Array] = None,
    sym_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Disentangled L1 point-matching loss. Returns (loss [B], parts)."""
    dR = rotmat_from_ortho6d(refiner_outputs[:, 0:6])
    vxvy = refiner_outputs[:, 6:8]
    vz = refiner_outputs[:, 8:9]
    TCO_gt = TCO_possible_gt[:, 0]
    fxfy = jnp.stack([K_crop[:, 0, 0], K_crop[:, 1, 1]], axis=-1)

    # ground-truth values of the disentangled outputs
    dR_gt = TCO_gt[:, :3, :3] @ jnp.swapaxes(TCO_input[:, :3, :3], -1, -2)
    tCO_gt = TCO_gt[:, :3, 3]
    tCR_out_gt = tCO_gt - jnp.squeeze(
        dR_gt @ (TCO_input[:, :3, 3] - tCR)[..., None], -1
    )
    vz_gt = tCR_out_gt[:, 2:3] / tCR[:, 2:3]
    vxvy_gt = fxfy * (
        tCR_out_gt[:, 0:2] / tCR_out_gt[:, 2:3] - tCR[:, 0:2] / tCR[:, 2:3]
    )

    if sym_mask is not None:
        # mask invalid symmetry slots by replacing them with slot 0
        TCO_possible_gt = jnp.where(
            sym_mask[..., None, None], TCO_possible_gt, TCO_gt[:, None]
        )

    def masked_update(vxvy_u, vz_u, dR_u, rows, cols):
        """GT pose with only the (rows, cols) block taken from the update."""
        upd = pose_update_with_reference_point(
            TCO_input, K_crop, jnp.concatenate([vxvy_u, vz_u], axis=-1), dR_u,
            tCR,
        )
        T = TCO_gt
        for r in rows:
            for c in cols:
                T = T.at[:, r, c].set(upd[:, r, c])
        return T

    # term 1: network rotation, gt translation
    TCO_pred_orn = masked_update(vxvy_gt, vz_gt, dR, (0, 1, 2), (0, 1, 2))
    # term 2: network vxvy, gt rest
    TCO_pred_xy = masked_update(vxvy, vz_gt, dR_gt, (0, 1), (3,))
    # term 3: network vz, gt rest
    TCO_pred_z = masked_update(vxvy_gt, vz, dR_gt, (2,), (3,))

    loss_orn, _ = loss_CO_symmetric(
        TCO_possible_gt, TCO_pred_orn, points, points_mask=points_mask
    )
    loss_xy, _ = loss_CO_symmetric(
        TCO_possible_gt, TCO_pred_xy, points, points_mask=points_mask
    )
    loss_z, _ = loss_CO_symmetric(
        TCO_possible_gt, TCO_pred_z, points, points_mask=points_mask
    )
    loss = loss_orn + loss_xy + loss_z
    return loss, {
        "loss_orn": loss_orn, "loss_xy": loss_xy, "loss_z": loss_z,
        "loss": loss,
    }


def loss_refiner_CO_disentangled(
    TCO_possible_gt: jax.Array,  # [B, S, 4, 4] symmetry-expanded GT
    TCO_input: jax.Array,  # [B, 4, 4]
    refiner_outputs: jax.Array,  # [B, 9] ortho6d or [B, 7] quaternion
    K_crop: jax.Array,  # [B, 3, 3]
    points: jax.Array,  # [B, P, 3]
    points_mask: Optional[jax.Array] = None,
    sym_mask: Optional[jax.Array] = None,
    rotation_param: str = "ortho6d",  # ortho6d | quaternion
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """CosyPose's object-center disentangled loss (no reference point).

    Parity: cosypose/lib3d/cosypose_ops.py:62-102
    (`loss_refiner_CO_disentangled`) and :104-145 (`_quaternions`): the
    three hypothetical updates are anchored at the input pose's own
    translation — xy via image-space offset scaled to the GT depth, z via
    `vz * z_input` — instead of the crop reference point."""
    if rotation_param == "quaternion":
        dR = quat_to_rotmat(refiner_outputs[:, 0:4])
        vxvyvz = refiner_outputs[:, 4:7]
    else:
        dR = rotmat_from_ortho6d(refiner_outputs[:, 0:6])
        vxvyvz = refiner_outputs[:, 6:9]
    TCO_gt = TCO_possible_gt[:, 0]
    if sym_mask is not None:
        TCO_possible_gt = jnp.where(
            sym_mask[..., None, None], TCO_possible_gt, TCO_gt[:, None]
        )

    TCO_pred_orn = TCO_gt.at[:, :3, :3].set(dR @ TCO_input[:, :3, :3])

    z_gt = TCO_gt[:, 2, 3:4]
    z_input = TCO_input[:, 2, 3:4]
    fxfy = jnp.stack([K_crop[:, 0, 0], K_crop[:, 1, 1]], axis=-1)
    xy = (vxvyvz[:, :2] / fxfy + TCO_input[:, :2, 3] / z_input) * z_gt
    TCO_pred_xy = TCO_gt.at[:, :2, 3].set(xy)

    TCO_pred_z = TCO_gt.at[:, 2, 3:4].set(vxvyvz[:, 2:3] * z_input)

    loss_orn, _ = loss_CO_symmetric(
        TCO_possible_gt, TCO_pred_orn, points, points_mask=points_mask
    )
    loss_xy, _ = loss_CO_symmetric(
        TCO_possible_gt, TCO_pred_xy, points, points_mask=points_mask
    )
    loss_z, _ = loss_CO_symmetric(
        TCO_possible_gt, TCO_pred_z, points, points_mask=points_mask
    )
    loss = loss_orn + loss_xy + loss_z
    return loss, {
        "loss_orn": loss_orn, "loss_xy": loss_xy, "loss_z": loss_z,
        "loss": loss,
    }


def coarse_classification_loss(
    logits: jax.Array,  # [B, n_views] or [B]
    positive_mask: jax.Array,  # same shape, 1.0 where the view is the positive
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Sigmoid BCE over rendered-view logits. Returns mean loss (scalar)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per = -(positive_mask * log_p + (1.0 - positive_mask) * log_not_p)
    if valid is not None:
        w = valid.astype(per.dtype)
        if w.ndim < per.ndim:
            w = w[..., None]
        w = jnp.broadcast_to(w, per.shape)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(per)
