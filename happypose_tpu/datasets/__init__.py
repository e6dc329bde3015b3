"""Datasets: BOP scene/object loaders, training iterators, augmentations."""

from happypose_tpu.datasets.bop import (
    BOPObjectDataset,
    BOPSceneDataset,
    SceneObservation,
)
from happypose_tpu.datasets.samplers import DistributedSceneSampler

__all__ = [
    "BOPObjectDataset",
    "BOPSceneDataset",
    "SceneObservation",
    "DistributedSceneSampler",
]
