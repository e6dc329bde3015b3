"""Device-mesh construction and placement helpers.

The TPU-native replacement for the reference's one-process-per-GPU NCCL
runtime (/root/reference/happypose/toolbox/utils/distributed.py:89-153):
a single program over a `jax.sharding.Mesh`, with data/hypothesis axes
sharded by NamedSharding and parameters replicated. Multi-host: the same
code runs under `jax.distributed.initialize` with a global mesh; shardings
ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("dp",),
) -> Mesh:
    """Build a mesh over all available devices (default: 1-D 'dp')."""
    devices = np.asarray(jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    assert int(np.prod(axis_sizes)) <= len(devices), (
        f"need {np.prod(axis_sizes)} devices, have {len(devices)}"
    )
    devices = devices[: int(np.prod(axis_sizes))].reshape(axis_sizes)
    return Mesh(devices, axis_names)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_leading(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every array's leading dimension over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim") and x.ndim > 0
        else x,
        tree,
    )
