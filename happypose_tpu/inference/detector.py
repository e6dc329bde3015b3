"""Detector wrapper: model outputs -> DetectionBatch for the pose pipeline.

Parity target: `Detector.get_detections`
(/root/reference/happypose/pose_estimators/cosypose/cosypose/integrated/
detector.py:16-131): score/mask thresholds, label mapping,
one_instance_per_class filtering, instance-id assignment.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from happypose_tpu.inference.types import DetectionBatch, ObservationBatch
from happypose_tpu.models.detector import (
    FCOSDetector,
    detector_postprocess,
)


class Detector:
    """Host-side wrapper owning the jitted detector forward."""

    def __init__(self, model: FCOSDetector, variables: dict):
        self.model = model
        self.variables = variables
        self._forward = jax.jit(
            lambda v, images: model.apply(v, images, train=False)
        )

    def get_detections(
        self,
        observation: ObservationBatch,
        detection_th: float = 0.3,
        one_instance_per_class: bool = False,
        max_detections: int = 32,
        iou_threshold: float = 0.5,
    ) -> Tuple[DetectionBatch, Dict[str, np.ndarray]]:
        """Run the detector; returns (DetectionBatch, extras with masks)."""
        out = self._forward(self.variables, observation.rgb)
        post = detector_postprocess(
            out,
            score_threshold=detection_th,
            iou_threshold=iou_threshold,
            max_detections=max_detections,
        )
        boxes = np.asarray(post["boxes"])
        scores = np.asarray(post["scores"])
        labels = np.asarray(post["labels"])
        valid = np.asarray(post["valid"])
        masks = np.asarray(post["masks"])

        rows_boxes, rows_ids, rows_im, rows_scores = [], [], [], []
        rows_masks = []
        for b in range(boxes.shape[0]):
            keep = np.where(valid[b])[0]
            if one_instance_per_class:
                # keep the best-scored instance per class
                # (detector.py:96-108 in the reference)
                best: Dict[int, int] = {}
                for i in keep:
                    c = int(labels[b, i])
                    if c not in best or scores[b, i] > scores[b, best[c]]:
                        best[c] = i
                keep = np.asarray(sorted(best.values()), int)
            for i in keep:
                rows_boxes.append(boxes[b, i])
                rows_ids.append(labels[b, i])
                rows_im.append(b)
                rows_scores.append(scores[b, i])
                rows_masks.append(masks[b, i])
        if not rows_boxes:
            det = DetectionBatch.from_numpy(
                boxes=np.zeros((0, 4), np.float32),
                obj_ids=np.zeros((0,), np.int32),
            )
            return det, {"masks": np.zeros((0, 1, 1), bool)}
        det = DetectionBatch.from_numpy(
            boxes=np.stack(rows_boxes),
            obj_ids=np.asarray(rows_ids, np.int32),
            batch_im_ids=np.asarray(rows_im, np.int32),
            scores=np.asarray(rows_scores, np.float32),
        )
        return det, {"masks": np.stack(rows_masks)}
