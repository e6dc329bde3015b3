"""FCOS + mask training loss for the detector.

Capability parity: the reference trains torchvision Mask R-CNN with its
internal loss dict (cosypose/training/train_detector.py:119-386,
maskrcnn_forward_loss.py:5). Our single-stage detector uses the standard
FCOS target assignment (center sampling by level range) with sigmoid focal
classification, GIoU box regression, centerness BCE, and YOLACT-style
per-instance mask BCE — all fixed-shape/masked.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from happypose_tpu.models.detector import DetectorOutputs, decode_boxes

# FCOS per-level regression ranges (in pixels)
_LEVEL_RANGES = ((0, 64), (64, 128), (128, 256), (256, 512), (512, 1e8))


class DetectionTargets(NamedTuple):
    boxes: jax.Array  # [B, G, 4] gt boxes (xyxy)
    labels: jax.Array  # [B, G] int
    masks: jax.Array  # [B, G, Hm, Wm] bool at prototype resolution
    valid: jax.Array  # [B, G]


def _assign_targets(
    locations: jax.Array,  # [L, 2]
    level_ids: jax.Array,  # [L]
    gt_boxes: jax.Array,  # [G, 4]
    gt_valid: jax.Array,  # [G]
) -> Tuple[jax.Array, jax.Array]:
    """FCOS assignment: a location is positive for the smallest-area gt box
    containing it whose max regression distance falls in the level's range.

    Returns (gt_idx [L] (-1 = negative), pos [L] bool)."""
    L = locations.shape[0]
    G = gt_boxes.shape[0]
    u = locations[:, 0:1]
    v = locations[:, 1:2]
    l = u - gt_boxes[None, :, 0]  # [L, G]... build via broadcast
    l = u - gt_boxes[:, 0][None, :]
    t = v - gt_boxes[:, 1][None, :]
    r = gt_boxes[:, 2][None, :] - u
    b = gt_boxes[:, 3][None, :] - v
    ltrb = jnp.stack([l, t, r, b], axis=-1)  # [L, G, 4]
    inside = jnp.min(ltrb, axis=-1) > 0
    max_d = jnp.max(ltrb, axis=-1)  # [L, G]
    lo = jnp.asarray([r[0] for r in _LEVEL_RANGES])[level_ids]  # [L]
    hi = jnp.asarray([r[1] for r in _LEVEL_RANGES])[level_ids]
    in_range = (max_d >= lo[:, None]) & (max_d <= hi[:, None])
    area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    cand = inside & in_range & gt_valid[None, :]
    area_m = jnp.where(cand, area[None, :], jnp.inf)
    gt_idx = jnp.argmin(area_m, axis=-1)
    pos = jnp.isfinite(jnp.min(area_m, axis=-1))
    return jnp.where(pos, gt_idx, -1), pos


def _focal_loss(logits, targets_onehot, alpha=0.25, gamma=2.0):
    p = jax.nn.sigmoid(logits)
    ce = -(
        targets_onehot * jax.nn.log_sigmoid(logits)
        + (1 - targets_onehot) * jax.nn.log_sigmoid(-logits)
    )
    pt = targets_onehot * p + (1 - targets_onehot) * (1 - p)
    w = targets_onehot * alpha + (1 - targets_onehot) * (1 - alpha)
    return w * ((1 - pt) ** gamma) * ce


def _giou(b1, b2):
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a1 = jnp.maximum(b1[..., 2] - b1[..., 0], 0) * jnp.maximum(
        b1[..., 3] - b1[..., 1], 0
    )
    a2 = jnp.maximum(b2[..., 2] - b2[..., 0], 0) * jnp.maximum(
        b2[..., 3] - b2[..., 1], 0
    )
    union = a1 + a2 - inter
    iou = inter / jnp.maximum(union, 1e-9)
    ex1 = jnp.minimum(b1[..., 0], b2[..., 0])
    ey1 = jnp.minimum(b1[..., 1], b2[..., 1])
    ex2 = jnp.maximum(b1[..., 2], b2[..., 2])
    ey2 = jnp.maximum(b1[..., 3], b2[..., 3])
    enc = jnp.maximum(ex2 - ex1, 0) * jnp.maximum(ey2 - ey1, 0)
    return iou - (enc - union) / jnp.maximum(enc, 1e-9)


def detector_loss(
    out: DetectorOutputs,
    targets: DetectionTargets,
    n_classes: int,
    n_mask_samples: int = 4,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss + parts. Batched over images."""

    def per_image(cls_logits, box_reg, ctr, coeffs, protos, gt):
        gt_boxes, gt_labels, gt_masks, gt_valid = gt
        gt_idx, pos = _assign_targets(
            out.locations, out.level_ids, gt_boxes, gt_valid
        )
        n_pos = jnp.maximum(pos.sum(), 1)

        # classification (focal over all locations)
        tgt_cls = jnp.where(pos, gt_labels[gt_idx], n_classes)  # bg sentinel
        onehot = jax.nn.one_hot(tgt_cls, n_classes)  # bg -> all zeros
        cls_l = _focal_loss(cls_logits, onehot).sum() / n_pos

        # box giou on positives
        pred_boxes = decode_boxes(out.locations, box_reg)
        gt_b = gt_boxes[gt_idx]
        giou = _giou(pred_boxes, gt_b)
        box_l = jnp.where(pos, 1.0 - giou, 0.0).sum() / n_pos

        # centerness bce
        u = out.locations[:, 0]
        v = out.locations[:, 1]
        l = u - gt_b[:, 0]
        t = v - gt_b[:, 1]
        r = gt_b[:, 2] - u
        b = gt_b[:, 3] - v
        ctr_tgt = jnp.sqrt(
            jnp.clip(
                (jnp.minimum(l, r) / jnp.maximum(jnp.maximum(l, r), 1e-9))
                * (jnp.minimum(t, b) / jnp.maximum(jnp.maximum(t, b), 1e-9)),
                0.0, 1.0,
            )
        )
        ctr_bce = -(
            ctr_tgt * jax.nn.log_sigmoid(ctr)
            + (1 - ctr_tgt) * jax.nn.log_sigmoid(-ctr)
        )
        ctr_l = jnp.where(pos, ctr_bce, 0.0).sum() / n_pos

        # mask loss: a few sampled positive locations per image
        score = jnp.where(pos, ctr_tgt, -1.0)
        _, samp = jax.lax.top_k(score, n_mask_samples)
        samp_valid = pos[samp]
        m_pred = jax.nn.sigmoid(
            jnp.einsum("hwp,np->nhw", protos, coeffs[samp])
        )
        m_gt = gt_masks[gt_idx[samp]].astype(jnp.float32)
        m_bce = -(
            m_gt * jnp.log(jnp.maximum(m_pred, 1e-7))
            + (1 - m_gt) * jnp.log(jnp.maximum(1 - m_pred, 1e-7))
        ).mean(axis=(1, 2))
        mask_l = jnp.where(samp_valid, m_bce, 0.0).sum() / jnp.maximum(
            samp_valid.sum(), 1
        )
        return cls_l, box_l, ctr_l, mask_l

    cls_l, box_l, ctr_l, mask_l = jax.vmap(per_image)(
        out.cls_logits, out.box_reg, out.centerness, out.mask_coeffs,
        out.prototypes,
        (targets.boxes, targets.labels, targets.masks, targets.valid),
    )
    parts = {
        "loss_cls": cls_l.mean(),
        "loss_box": box_l.mean(),
        "loss_ctr": ctr_l.mean(),
        "loss_mask": mask_l.mean(),
    }
    total = sum(parts.values())
    return total, parts
