"""Pose distances and losses: ADD, ADD-S, symmetry-aware minima (pure JAX).

Parity targets:
- /root/reference/happypose/toolbox/lib3d/mesh_losses.py (`compute_ADD_L1_loss`
  :39, `compute_ADDS_loss` :23).
- /root/reference/happypose/toolbox/lib3d/distances.py (`dists_add` :23,
  `dists_add_symmetric` :41).
- /root/reference/happypose/pose_estimators/cosypose/cosypose/lib3d/
  symmetric_distances.py (`symmetric_distance_batched_fast` :36).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.transforms import transform_pts


def dists_add(TXO_pred: jax.Array, TXO_gt: jax.Array, points: jax.Array) -> jax.Array:
    """Per-point residuals gt - pred, [B, P, 3]."""
    return transform_pts(TXO_gt, points) - transform_pts(TXO_pred, points)


def dists_add_symmetric(
    TXO_pred: jax.Array, TXO_gt: jax.Array, points: jax.Array
) -> jax.Array:
    """ADD-S residuals: each gt point matched to its nearest predicted point.

    Note the pairing direction matches the reference (distances.py:41-51):
    for every gt point j, pick argmin over gt index axis of ||gt_i - pred_j||.
    Returns [B, P, 3].
    """
    pred = transform_pts(TXO_pred, points)
    gt = transform_pts(TXO_gt, points)
    d = gt[:, :, None, :] - pred[:, None, :, :]  # [B, Pgt, Ppred, 3]
    d2 = jnp.sum(d * d, axis=-1)
    assign = jnp.argmin(d2, axis=1)  # [B, Ppred]
    return jnp.take_along_axis(d, assign[:, None, :, None], axis=1)[:, 0]


def compute_ADD_L1_loss(
    TCO_gt: jax.Array, TCO_pred: jax.Array, points: jax.Array,
    points_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean |gt - pred| over points and coords, [B]."""
    diff = jnp.abs(dists_add(TCO_pred, TCO_gt, points))
    if points_mask is not None:
        m = points_mask[..., None].astype(diff.dtype)
        return jnp.sum(diff * m, axis=(-1, -2)) / jnp.maximum(
            jnp.sum(m, axis=(-1, -2)) * 3, 1.0
        ) * 3.0
    return jnp.mean(diff, axis=(-1, -2))


def compute_ADDS_loss(
    TCO_gt: jax.Array, TCO_pred: jax.Array, points: jax.Array
) -> jax.Array:
    """Symmetric squared loss with nearest-point assignment, [B]."""
    pred = transform_pts(TCO_pred, points)
    gt = transform_pts(TCO_gt, points)
    d = gt[:, :, None, :] - pred[:, None, :, :]
    d2 = d * d
    assign = jnp.argmin(jnp.sum(d2, axis=-1), axis=1)
    matched = jnp.take_along_axis(d2, assign[:, None, :, None], axis=1)[:, 0]
    return jnp.mean(matched, axis=(-1, -2))


def loss_CO_symmetric(
    TCO_possible_gt: jax.Array,
    TCO_pred: jax.Array,
    points: jax.Array,
    l2: bool = False,
    points_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Min over symmetry-expanded GT poses of the mean pointwise loss.

    Parity: cosypose_ops.py:65-79.

    Args:
      TCO_possible_gt: [B, S, 4, 4]; TCO_pred: [B, 4, 4]; points: [B, P, 3].
    Returns:
      (loss [B], TCO_assign [B, 4, 4]) — loss and the selected GT pose.
    """
    gt_pts = transform_pts(TCO_possible_gt, points)  # [B, S, P, 3]
    pred_pts = transform_pts(TCO_pred, points)  # [B, P, 3]
    diff = pred_pts[:, None] - gt_pts  # [B, S, P, 3]
    per = diff ** 2 if l2 else jnp.abs(diff)
    if points_mask is not None:
        m = points_mask[:, None, :, None].astype(per.dtype)
        losses = jnp.sum(per * m, axis=(-1, -2)) / jnp.maximum(
            jnp.sum(m, axis=(-1, -2)) * 3.0, 1.0
        ) * 3.0
    else:
        losses = jnp.mean(per.reshape(*per.shape[:2], -1), axis=-1)  # [B, S]
    min_id = jnp.argmin(losses, axis=1)
    loss = jnp.take_along_axis(losses, min_id[:, None], axis=1)[:, 0]
    TCO_assign = jnp.take_along_axis(
        TCO_possible_gt, min_id[:, None, None, None], axis=1
    )[:, 0]
    return loss, TCO_assign


def symmetric_distance_batched(
    T1: jax.Array,
    T2: jax.Array,
    points: jax.Array,
    symmetries: jax.Array,
    points_mask: Optional[jax.Array] = None,
    sym_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """min_s mean_p || T1 S_s p - T2 p || and the aligned pose T1 @ S_best.

    Parity: cosypose symmetric_distances.py:36-55, reformulated dense/masked
    for fixed shapes (padded symmetries marked invalid via sym_mask).

    Args:
      T1, T2: [B, 4, 4]; points: [B, P, 3]; symmetries: [B, S, 4, 4].
    Returns:
      (dist [B], T1_aligned [B, 4, 4]).
    """
    T1_sym = jnp.einsum("bij,bsjk->bsik", T1, symmetries)  # [B, S, 4, 4]
    pts1 = transform_pts(T1_sym, points)  # [B, S, P, 3]
    pts2 = transform_pts(T2, points)  # [B, P, 3]
    d = jnp.linalg.norm(pts1 - pts2[:, None], axis=-1)  # [B, S, P]
    if points_mask is not None:
        m = points_mask[:, None, :].astype(d.dtype)
        dist_per_sym = jnp.sum(d * m, axis=-1) / jnp.maximum(jnp.sum(m, -1), 1.0)
    else:
        dist_per_sym = jnp.mean(d, axis=-1)  # [B, S]
    if sym_mask is not None:
        dist_per_sym = jnp.where(sym_mask, dist_per_sym, jnp.inf)
    best = jnp.argmin(dist_per_sym, axis=1)
    dist = jnp.take_along_axis(dist_per_sym, best[:, None], axis=1)[:, 0]
    T1_aligned = jnp.take_along_axis(T1_sym, best[:, None, None, None], axis=1)[:, 0]
    return dist, T1_aligned
