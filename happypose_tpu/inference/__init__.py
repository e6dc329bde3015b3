"""Inference pipelines: CosyPose (known objects) and MegaPose (novel objects)."""

from happypose_tpu.inference.types import (
    ObservationBatch,
    DetectionBatch,
    PoseEstimateBatch,
    InferenceConfig,
)
from happypose_tpu.inference.pose_estimator import PoseEstimator

__all__ = [
    "ObservationBatch",
    "DetectionBatch",
    "PoseEstimateBatch",
    "InferenceConfig",
    "PoseEstimator",
]
