"""Flax models: CNN backbones and render-and-compare pose predictors."""

from happypose_tpu.models.backbones import WideResNet18, WideResNet34, ResNet34
from happypose_tpu.models.pose_predictor import (
    PosePredictor,
    PosePredictorConfig,
    PoseOutputs,
)

__all__ = [
    "WideResNet18",
    "WideResNet34",
    "ResNet34",
    "PosePredictor",
    "PosePredictorConfig",
    "PoseOutputs",
]
