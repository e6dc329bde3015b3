"""Collective helpers: metric reduction, model sync, prediction gather,
sharded batched apply.

Parity targets (/root/reference/happypose/toolbox/utils/...):
- `reduce_dict` (distributed.py:105-132, NCCL all_reduce average) -> pmean.
- `sync_model` / `sync_config` (distributed.py:46-77, file+barrier
  broadcast) -> `broadcast_one_to_all`.
- `gather_distributed` (tensor_collection.py:166-187, file round-trip
  gather) -> `process_allgather` of fixed-shape arrays.
- the hypothesis-axis chunking (`bsz_images`) -> `sharded_batch_apply`,
  which shards the leading (hypothesis) axis over the mesh so the
  B x M = detections x SO(3)-grid scoring runs devices-parallel
  (SURVEY.md §5.7's "long axis").
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def reduce_dict(metrics: Dict[str, jax.Array], axis: str) -> Dict[str, jax.Array]:
    """Average a metrics dict across an axis (use inside shard_map/pmap)."""
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis), metrics)


def sync_model(variables: Any) -> Any:
    """Broadcast process-0 values to all processes (multi-host startup).

    No shared-filesystem assumption (unlike the reference)."""
    if jax.process_count() == 1:
        return variables
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(variables)


def gather_predictions(tree: Any) -> Any:
    """All-gather fixed-shape prediction arrays across processes; on a
    single process this is the identity."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def sharded_batch_apply(
    fn: Callable,
    mesh: Mesh,
    axis: str = "dp",
):
    """Wrap `fn(batch) -> out` so the leading axis of both is sharded over
    the mesh: each device computes its hypothesis shard, outputs concatenate
    by construction (no collective). The batch's leading dim must divide by
    the axis size."""
    smapped = shard_map(
        fn, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(smapped)
