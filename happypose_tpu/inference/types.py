"""Inference data types — fixed-shape pytrees with validity masks.

Parity target: /root/reference/happypose/toolbox/inference/types.py
(ObservationTensor :101-235, DetectionsType/PoseEstimatesType :53-72,
InferenceConfig :87-99) and the PandasTensorCollection container
(toolbox/utils/tensor_collection.py). Design delta (SURVEY.md §7): all
per-row metadata is int32/float arrays + a validity mask, so every pipeline
stage jits, shards, and pads to static shapes; pandas exists only at the
BOP-csv rim.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pytree(cls):
    """Register a dataclass as a pytree (all fields are children)."""
    fields = [f for f in cls.__dataclass_fields__]

    def flatten(o):
        return tuple(getattr(o, f) for f in fields), None

    def unflatten(aux, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree
@dataclass
class ObservationBatch:
    """A batch of observed images + intrinsics.

    rgb: [B, 3, H, W] float32 in [0, 1]; depth: [B, 1, H, W] or None.
    K: [B, 3, 3].
    """

    rgb: jax.Array
    K: jax.Array
    depth: Optional[jax.Array] = None

    @property
    def batch_size(self) -> int:
        return self.rgb.shape[0]

    @property
    def images(self) -> jax.Array:
        """[B, 3(+1), H, W] with depth as 4th channel when present."""
        if self.depth is None:
            return self.rgb
        return jnp.concatenate([self.rgb, self.depth], axis=1)

    @staticmethod
    def from_numpy(
        rgb: np.ndarray, K: np.ndarray, depth: Optional[np.ndarray] = None
    ) -> "ObservationBatch":
        """rgb uint8 [H, W, 3] or [B, H, W, 3] -> normalized ObservationBatch."""
        if rgb.ndim == 3:
            rgb = rgb[None]
        if rgb.dtype == np.uint8:
            rgb = rgb.astype(np.float32) / 255.0
        rgb = np.moveaxis(rgb, -1, 1)
        if K.ndim == 2:
            K = K[None]
        d = None
        if depth is not None:
            if depth.ndim == 2:
                depth = depth[None]
            d = jnp.asarray(depth[:, None].astype(np.float32))
        return ObservationBatch(rgb=jnp.asarray(rgb), K=jnp.asarray(K.astype(np.float32)), depth=d)


@_pytree
@dataclass
class DetectionBatch:
    """Fixed-size set of 2D detections across a batch of images.

    boxes: [N, 4] (x1, y1, x2, y2); obj_ids: [N] int32 (-index into the mesh
    database); batch_im_ids: [N] which observation image; instance_ids: [N]
    disambiguates repeated objects; scores: [N]; valid: [N].
    """

    boxes: jax.Array
    obj_ids: jax.Array
    batch_im_ids: jax.Array
    instance_ids: jax.Array
    scores: jax.Array
    valid: jax.Array

    @property
    def n_rows(self) -> int:
        return self.boxes.shape[0]

    @staticmethod
    def pad(det: "DetectionBatch", n: int) -> "DetectionBatch":
        cur = det.n_rows
        if cur == n:
            return det
        if cur > n:
            # keep the n best-scored detections
            order = np.argsort(-np.asarray(det.scores))[:n]
            return jax.tree.map(lambda x: x[jnp.asarray(order)], det)
        p = n - cur

        def padrow(x):
            widths = [(0, p)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        return DetectionBatch(
            boxes=padrow(det.boxes),
            obj_ids=padrow(det.obj_ids),
            batch_im_ids=padrow(det.batch_im_ids),
            instance_ids=padrow(det.instance_ids),
            scores=padrow(det.scores),
            valid=padrow(det.valid),
        )

    @staticmethod
    def from_numpy(
        boxes: np.ndarray,
        obj_ids: np.ndarray,
        batch_im_ids: Optional[np.ndarray] = None,
        scores: Optional[np.ndarray] = None,
    ) -> "DetectionBatch":
        n = len(boxes)
        if batch_im_ids is None:
            batch_im_ids = np.zeros((n,), np.int32)
        if scores is None:
            scores = np.ones((n,), np.float32)
        # instance id: running index within (im, obj) groups
        inst = np.zeros((n,), np.int32)
        seen = {}
        for i in range(n):
            key = (int(batch_im_ids[i]), int(obj_ids[i]))
            inst[i] = seen.get(key, 0)
            seen[key] = inst[i] + 1
        return DetectionBatch(
            boxes=jnp.asarray(boxes.astype(np.float32)),
            obj_ids=jnp.asarray(obj_ids.astype(np.int32)),
            batch_im_ids=jnp.asarray(batch_im_ids.astype(np.int32)),
            instance_ids=jnp.asarray(inst),
            scores=jnp.asarray(scores.astype(np.float32)),
            valid=jnp.ones((n,), bool),
        )


@_pytree
@dataclass
class PoseEstimateBatch:
    """Pose hypotheses/estimates; the universal pipeline currency.

    poses: [N, 4, 4]; K: [N, 3, 3] (per-instance intrinsics); plus detection
    metadata and scoring fields. `valid` masks padding rows.
    """

    poses: jax.Array
    K: jax.Array
    obj_ids: jax.Array
    batch_im_ids: jax.Array
    instance_ids: jax.Array
    hypothesis_ids: jax.Array
    scores: jax.Array  # detection score (carried through)
    coarse_logits: jax.Array  # coarse model score
    pose_logits: jax.Array  # scoring model score of refined pose
    valid: jax.Array

    @property
    def n_rows(self) -> int:
        return self.poses.shape[0]

    def select(self, idx: jax.Array) -> "PoseEstimateBatch":
        return jax.tree.map(lambda x: x[idx], self)

    def mask_where(self, keep: jax.Array) -> "PoseEstimateBatch":
        return replace_valid(self, self.valid & keep)


def replace_valid(pe: PoseEstimateBatch, valid: jax.Array) -> PoseEstimateBatch:
    return PoseEstimateBatch(
        poses=pe.poses, K=pe.K, obj_ids=pe.obj_ids,
        batch_im_ids=pe.batch_im_ids, instance_ids=pe.instance_ids,
        hypothesis_ids=pe.hypothesis_ids, scores=pe.scores,
        coarse_logits=pe.coarse_logits, pose_logits=pe.pose_logits, valid=valid,
    )


@dataclass(frozen=True)
class InferenceConfig:
    """Pipeline configuration (static).

    Mirrors the reference defaults (inference/types.py:88-99): 5 refiner
    iterations, SO(3) grid of 576, 5 kept pose hypotheses (each refined,
    then re-scored, then top-1), chunked batching.
    """

    n_refiner_iterations: int = 5
    n_coarse_iterations: int = 1  # CosyPose-style coarse
    n_pose_hypotheses: int = 5
    SO3_grid_size: int = 576
    bsz_images: int = 288  # coarse hypotheses per forward chunk
    bsz_objects: int = 16  # refiner instances per forward chunk
    run_depth_refiner: bool = False
    depth_refiner: Optional[str] = None  # icp
