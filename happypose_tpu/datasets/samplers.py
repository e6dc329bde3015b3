"""Deterministic frame sharding across processes/hosts.

Parity target: /root/reference/happypose/toolbox/datasets/samplers.py:38-52
(`DistributedSceneSampler`: permute frame indices with a fixed seed, then
np.array_split per rank)."""

from __future__ import annotations

from typing import List

import numpy as np


class DistributedSceneSampler:
    """Static, deterministic split of frame indices per rank."""

    def __init__(self, n_frames: int, num_replicas: int, rank: int,
                 shuffle: bool = True, seed: int = 0):
        indices = np.arange(n_frames)
        if shuffle:
            indices = np.random.RandomState(seed).permutation(indices)
        self.indices: List[int] = np.array_split(indices, num_replicas)[rank].tolist()

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)


class PartialSampler:
    """First-epoch-size sample of a dataset (reference samplers.py:20-35)."""

    def __init__(self, n_frames: int, epoch_size: int, seed: int = 0):
        epoch_size = min(epoch_size, n_frames)
        self.indices = np.random.RandomState(seed).permutation(n_frames)[
            :epoch_size
        ].tolist()

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)
