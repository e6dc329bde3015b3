"""Masked group-by / segment ops (pure JAX, static shapes).

These replace two host-side mechanisms of the reference:
- pandas group-by top-k (`filter_top_pose_estimates`,
  /root/reference/happypose/toolbox/utils/tensor_collection.py:201-230)
- the C++ extension's `scatter_argmin` / `expand_ids_for_symmetry`
  (/root/reference/happypose/pose_estimators/cosypose/cosypose/csrc/
  cosypose_cext.cpp:220-261)

Everything operates on fixed-size arrays with validity masks, so it jits and
shards; invalid rows never win a comparison.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def group_keys(*cols: jax.Array) -> jax.Array:
    """Combine int columns into one int64-safe int32 group key.

    Columns must be small non-negative ints (ids); combined with mixed-radix
    packing using per-column ranges derived from the static max bound 2^10
    per column (sufficient for batch/object/instance ids in this domain).
    """
    key = jnp.zeros_like(cols[0])
    for c in cols:
        key = key * 1024 + jnp.clip(c, 0, 1023)
    return key


def topk_per_group(
    key: jax.Array,
    score: jax.Array,
    valid: jax.Array,
    k: int,
) -> jax.Array:
    """Mask selecting the top-k scores within each group.

    Args:
      key: [N] int32 group ids.
      score: [N] float; higher is better.
      valid: [N] bool.
      k: static.
    Returns:
      [N] bool — True for rows that are among their group's top-k.
    """
    N = key.shape[0]
    # rank rows: sort by (valid desc, key asc, score desc)
    big = jnp.int32(2**30)
    k_sort = jnp.where(valid, key, big)
    order = jnp.lexsort((-score, k_sort))  # primary: key, secondary: -score
    sorted_key = k_sort[order]
    # rank within group = position - first position of this key
    idx = jnp.arange(N)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    start_pos = jnp.where(is_start, idx, 0)
    start_run = jax.lax.associative_scan(jnp.maximum, start_pos)
    rank_sorted = idx - start_run
    keep_sorted = (rank_sorted < k) & (sorted_key != big)
    # scatter back to original order
    keep = jnp.zeros((N,), bool).at[order].set(keep_sorted)
    return keep & valid


def argmin_per_group(
    key: jax.Array, value: jax.Array, valid: jax.Array, n_groups: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-group argmin (the C++ `scatter_argmin` equivalent).

    Args:
      key: [N] int32 in [0, n_groups); value: [N]; valid: [N] bool.
    Returns:
      (argmin_idx [n_groups] int32 — index into N, or -1 if group empty,
       min_value [n_groups]).
    """
    inf = jnp.asarray(jnp.inf, value.dtype)
    v = jnp.where(valid, value, inf)
    mins = jnp.full((n_groups,), inf, value.dtype).at[key].min(v)
    # tie-break: lowest index wins
    N = key.shape[0]
    idxs = jnp.arange(N, dtype=jnp.int32)
    cand = jnp.where(valid & (v == mins[key]), idxs, N)
    arg = jnp.full((n_groups,), N, jnp.int32).at[key].min(cand)
    arg = jnp.where(arg == N, -1, arg)
    return arg, mins


def expand_for_symmetry(
    n_sym_per_row: jax.Array, max_total: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Ragged symmetry expansion as dense gather indices (cext equivalent).

    Given per-row symmetry counts, produce (row_idx [max_total], sym_idx
    [max_total], valid [max_total]) such that iterating the valid prefix
    enumerates (row, sym) pairs in row-major order, padded to max_total.
    """
    N = n_sym_per_row.shape[0]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_sym_per_row.astype(jnp.int32))]
    )
    total = offsets[-1]
    pos = jnp.arange(max_total, dtype=jnp.int32)
    # row of each output slot: searchsorted over offsets
    row = jnp.searchsorted(offsets[1:], pos, side="right").astype(jnp.int32)
    row = jnp.clip(row, 0, N - 1)
    sym = pos - offsets[row]
    valid = pos < total
    return jnp.where(valid, row, 0), jnp.where(valid, sym, 0), valid
