"""Object detector with instance masks (Flax, single-stage, static shapes).

Capability parity target: the reference's `DetectorMaskRCNN`
(/root/reference/happypose/pose_estimators/cosypose/cosypose/models/
mask_rcnn.py:6-27 — torchvision Mask R-CNN, resnet50-FPN) and its wrapper
`Detector.get_detections` (cosypose/integrated/detector.py:16-131).

TPU-first design delta (SURVEY.md §7): a two-stage detector's dynamic
proposal shapes are hostile to XLA; this is an anchor-free FCOS-style dense
detector (Tian et al., ICCV'19) with a YOLACT-style prototype mask branch
(Bolya et al., ICCV'19) on a ResNet50-FPN. Everything — training loss and
inference (top-k + NMS over a fixed budget) — is static-shape and jittable.
The pipeline-facing API matches the reference: boxes, labels, scores,
binary masks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
        )
        residual = x
        out = nn.relu(norm()(nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)))
        out = nn.relu(norm()(nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype)(out)))
        out = norm()(nn.Conv(
            self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype)(out))
        if self.downsample:
            residual = norm()(nn.Conv(
                self.planes * 4, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype)(x))
        return nn.relu(out + residual)


class ResNet50FPN(nn.Module):
    """ResNet50 backbone + FPN; returns pyramid levels P3..P7 (NHWC)."""

    fpn_channels: int = 256
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
        )
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(norm()(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3))
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                ds = b == 0
                x = Bottleneck(
                    planes=planes, stride=s, downsample=ds, dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                )(x, train=train)
                inplanes = planes * 4
            feats.append(x)
        c2, c3, c4, c5 = feats

        # FPN top-down
        p5 = nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype)(c5)
        p4 = nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype)(c4)
        p3 = nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype)(c3)
        p4 = p4 + jax.image.resize(p5, p4.shape, "nearest")
        p3 = p3 + jax.image.resize(p4, p3.shape, "nearest")
        p3 = nn.Conv(self.fpn_channels, (3, 3), padding=1, dtype=self.dtype)(p3)
        p4 = nn.Conv(self.fpn_channels, (3, 3), padding=1, dtype=self.dtype)(p4)
        p5 = nn.Conv(self.fpn_channels, (3, 3), padding=1, dtype=self.dtype)(p5)
        p6 = nn.Conv(self.fpn_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype)(p5)
        p7 = nn.Conv(self.fpn_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype)(nn.relu(p6))
        return [p3, p4, p5, p6, p7], c2


@dataclass(frozen=True)
class DetectorConfig:
    n_classes: int  # number of object labels (background-free)
    n_prototypes: int = 16
    fpn_channels: int = 256
    head_depth: int = 2
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    compute_dtype: str = "float32"
    bn_axis_name: Optional[str] = None


class DetectorOutputs(NamedTuple):
    cls_logits: jax.Array  # [B, L, n_classes] over all pyramid locations
    box_reg: jax.Array  # [B, L, 4] distances l, t, r, b (stride-scaled)
    centerness: jax.Array  # [B, L]
    mask_coeffs: jax.Array  # [B, L, n_proto]
    prototypes: jax.Array  # [B, Hp, Wp, n_proto] (P3/2 resolution)
    locations: jax.Array  # [L, 2] (u, v) pixel centers
    level_ids: jax.Array  # [L]


class FCOSDetector(nn.Module):
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, images, train: bool = False) -> DetectorOutputs:
        """images: [B, 3, H, W] in [0, 1]."""
        cfg = self.cfg
        dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        x = jnp.moveaxis(images, 1, -1).astype(dtype)
        pyramid, c2 = ResNet50FPN(
            fpn_channels=cfg.fpn_channels, dtype=dtype,
            bn_axis_name=cfg.bn_axis_name,
        )(x, train=train)

        # shared heads across levels
        cls_tower = [
            nn.Conv(cfg.fpn_channels, (3, 3), padding=1, dtype=dtype,
                    name=f"cls_tower_{i}")
            for i in range(cfg.head_depth)
        ]
        box_tower = [
            nn.Conv(cfg.fpn_channels, (3, 3), padding=1, dtype=dtype,
                    name=f"box_tower_{i}")
            for i in range(cfg.head_depth)
        ]
        cls_head = nn.Conv(
            cfg.n_classes, (3, 3), padding=1, dtype=dtype, name="cls_head",
            bias_init=nn.initializers.constant(-4.6),  # focal prior ~0.01
        )
        box_head = nn.Conv(4, (3, 3), padding=1, dtype=dtype, name="box_head")
        ctr_head = nn.Conv(1, (3, 3), padding=1, dtype=dtype, name="ctr_head")
        coef_head = nn.Conv(
            cfg.n_prototypes, (3, 3), padding=1, dtype=dtype, name="coef_head"
        )

        all_cls, all_box, all_ctr, all_coef = [], [], [], []
        all_loc, all_lvl = [], []
        for lvl, (p, stride) in enumerate(zip(pyramid, cfg.strides)):
            c = p
            for conv in cls_tower:
                c = nn.relu(conv(c))
            b = p
            for conv in box_tower:
                b = nn.relu(conv(b))
            cls = cls_head(c)
            box = jnp.exp(box_head(b)) * stride  # positive distances
            ctr = ctr_head(b)[..., 0]
            coef = jnp.tanh(coef_head(c))
            B, Hl, Wl = cls.shape[:3]
            all_cls.append(cls.reshape(B, Hl * Wl, -1).astype(jnp.float32))
            all_box.append(box.reshape(B, Hl * Wl, 4).astype(jnp.float32))
            all_ctr.append(ctr.reshape(B, Hl * Wl).astype(jnp.float32))
            all_coef.append(coef.reshape(B, Hl * Wl, -1).astype(jnp.float32))
            uu = (jnp.arange(Wl) + 0.5) * stride
            vv = (jnp.arange(Hl) + 0.5) * stride
            loc = jnp.stack(
                [jnp.tile(uu, Hl), jnp.repeat(vv, Wl)], axis=-1
            )
            all_loc.append(loc)
            all_lvl.append(jnp.full((Hl * Wl,), lvl, jnp.int32))

        # prototype masks from P3 (upsampled 2x)
        proto = pyramid[0]
        for _ in range(2):
            proto = nn.relu(
                nn.Conv(cfg.fpn_channels // 2, (3, 3), padding=1, dtype=dtype)(
                    proto
                )
            )
        proto = jax.image.resize(
            proto, (proto.shape[0], proto.shape[1] * 2, proto.shape[2] * 2,
                    proto.shape[3]), "bilinear",
        )
        proto = nn.Conv(cfg.n_prototypes, (1, 1), dtype=dtype)(proto)
        proto = nn.relu(proto).astype(jnp.float32)

        return DetectorOutputs(
            cls_logits=jnp.concatenate(all_cls, axis=1),
            box_reg=jnp.concatenate(all_box, axis=1),
            centerness=jnp.concatenate(all_ctr, axis=1),
            mask_coeffs=jnp.concatenate(all_coef, axis=1),
            prototypes=proto,
            locations=jnp.concatenate(all_loc, axis=0),
            level_ids=jnp.concatenate(all_lvl, axis=0),
        )


# ----------------------------------------------------------------------
# Inference: decode + NMS (static shapes)
# ----------------------------------------------------------------------


def decode_boxes(locations: jax.Array, box_reg: jax.Array) -> jax.Array:
    """FCOS distances (l, t, r, b) -> (x1, y1, x2, y2)."""
    u, v = locations[..., 0], locations[..., 1]
    l, t, r, b = box_reg[..., 0], box_reg[..., 1], box_reg[..., 2], box_reg[..., 3]
    return jnp.stack([u - l, v - t, u + r, v + b], axis=-1)


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """[N, N] IoU."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)


def nms_fixed(
    boxes: jax.Array, scores: jax.Array, labels: jax.Array,
    iou_threshold: float = 0.5, max_out: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Class-aware NMS over a fixed candidate budget.

    Returns (keep_idx [max_out], keep_valid [max_out])."""
    N = boxes.shape[0]
    iou = _iou_matrix(boxes)
    same_class = labels[:, None] == labels[None, :]
    suppress_pair = (iou > iou_threshold) & same_class

    order = jnp.argsort(-scores)

    def body(i, state):
        alive, keep, kv, nk = state
        cand = order[i]
        ok = alive[cand] & (nk < max_out)
        keep = keep.at[jnp.minimum(nk, max_out - 1)].set(
            jnp.where(ok, cand, keep[jnp.minimum(nk, max_out - 1)])
        )
        kv = kv.at[jnp.minimum(nk, max_out - 1)].set(
            jnp.where(ok, True, kv[jnp.minimum(nk, max_out - 1)])
        )
        nk = nk + ok.astype(jnp.int32)
        alive = alive & (~suppress_pair[cand] | ~ok)
        return alive, keep, kv, nk

    alive0 = jnp.ones((N,), bool)
    keep0 = jnp.zeros((max_out,), jnp.int32)
    kv0 = jnp.zeros((max_out,), bool)
    alive, keep, kv, nk = jax.lax.fori_loop(
        0, N, body, (alive0, keep0, kv0, jnp.int32(0))
    )
    return keep, kv


@partial(
    jax.jit,
    static_argnames=("score_threshold", "iou_threshold", "pre_nms_topk",
                     "max_detections", "mask_threshold"),
)
def detector_postprocess(
    out: DetectorOutputs,
    score_threshold: float = 0.3,
    iou_threshold: float = 0.5,
    pre_nms_topk: int = 256,
    max_detections: int = 32,
    mask_threshold: float = 0.5,
) -> Dict[str, jax.Array]:
    """Decode one batch of detector outputs into fixed-size detections.

    Returns dict of [B, max_detections, ...] arrays + valid mask and
    [B, max_detections, Hm, Wm] instance masks (prototype resolution)."""

    def per_image(cls_logits, box_reg, ctr, coeffs, protos, locations):
        probs = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(ctr)[:, None]
        best_c = jnp.argmax(probs, axis=-1)
        best_p = jnp.max(probs, axis=-1)
        k = min(pre_nms_topk, best_p.shape[0])
        top_p, top_i = jax.lax.top_k(best_p, k)
        boxes = decode_boxes(locations[top_i], box_reg[top_i])
        labels = best_c[top_i]
        keep, kv = nms_fixed(
            boxes, top_p, labels, iou_threshold, max_detections
        )
        sel_boxes = boxes[keep]
        sel_scores = top_p[keep]
        sel_labels = labels[keep]
        sel_valid = kv & (sel_scores > score_threshold)
        sel_coeffs = coeffs[top_i][keep]  # [max_out, n_proto]
        masks = jax.nn.sigmoid(
            jnp.einsum("hwp,np->nhw", protos, sel_coeffs)
        )
        # crop masks to their boxes (YOLACT crop) at prototype scale
        Hm, Wm = masks.shape[1:]
        scale = 4.0  # prototypes are stride-4
        mu = (jnp.arange(Wm) + 0.5) * scale
        mv = (jnp.arange(Hm) + 0.5) * scale
        in_box = (
            (mu[None, None, :] >= sel_boxes[:, None, None, 0])
            & (mu[None, None, :] <= sel_boxes[:, None, None, 2])
            & (mv[None, :, None] >= sel_boxes[:, None, None, 1])
            & (mv[None, :, None] <= sel_boxes[:, None, None, 3])
        )
        masks = jnp.where(in_box, masks, 0.0) > mask_threshold
        return sel_boxes, sel_scores, sel_labels, sel_valid, masks

    boxes, scores, labels, valid, masks = jax.vmap(per_image)(
        out.cls_logits, out.box_reg, out.centerness, out.mask_coeffs,
        out.prototypes, jnp.broadcast_to(
            out.locations, (out.cls_logits.shape[0],) + out.locations.shape
        ),
    )
    return {
        "boxes": boxes, "scores": scores, "labels": labels, "valid": valid,
        "masks": masks,
    }
