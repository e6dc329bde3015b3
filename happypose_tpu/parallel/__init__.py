"""Parallelism: device meshes, collectives, hypothesis-axis sharding."""

from happypose_tpu.parallel.mesh import make_mesh, replicate, shard_leading
from happypose_tpu.parallel.collectives import (
    reduce_dict,
    sync_model,
    gather_predictions,
    sharded_batch_apply,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_leading",
    "reduce_dict",
    "sync_model",
    "gather_predictions",
    "sharded_batch_apply",
]
