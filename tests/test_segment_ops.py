"""Segment op tests vs brute-force numpy oracles."""

import numpy as np
import jax.numpy as jnp

from happypose_tpu.ops.segment_ops import (
    argmin_per_group,
    expand_for_symmetry,
    group_keys,
    topk_per_group,
)


def test_topk_per_group_matches_oracle():
    rs = np.random.RandomState(0)
    N = 64
    key = rs.randint(0, 5, N).astype(np.int32)
    score = rs.rand(N).astype(np.float32)
    valid = rs.rand(N) > 0.2
    for k in (1, 2, 3):
        keep = np.asarray(
            topk_per_group(jnp.asarray(key), jnp.asarray(score), jnp.asarray(valid), k)
        )
        # oracle
        expect = np.zeros(N, bool)
        for g in np.unique(key):
            rows = np.where((key == g) & valid)[0]
            top = rows[np.argsort(-score[rows])][:k]
            expect[top] = True
        np.testing.assert_array_equal(keep, expect)


def test_topk_all_invalid():
    keep = topk_per_group(
        jnp.zeros(4, jnp.int32), jnp.ones(4), jnp.zeros(4, bool), 2
    )
    assert not bool(np.asarray(keep).any())


def test_argmin_per_group():
    key = jnp.asarray([0, 0, 1, 2, 2, 2], jnp.int32)
    val = jnp.asarray([3.0, 1.0, 5.0, 2.0, 2.0, 0.5])
    valid = jnp.asarray([True, True, True, True, False, True])
    arg, mins = argmin_per_group(key, val, valid, 4)
    np.testing.assert_array_equal(np.asarray(arg), [1, 2, 5, -1])
    np.testing.assert_allclose(np.asarray(mins)[:3], [1.0, 5.0, 0.5])


def test_expand_for_symmetry():
    n_sym = jnp.asarray([2, 1, 3], jnp.int32)
    row, sym, valid = expand_for_symmetry(n_sym, 8)
    np.testing.assert_array_equal(np.asarray(valid), [1, 1, 1, 1, 1, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(row)[:6], [0, 0, 1, 2, 2, 2])
    np.testing.assert_array_equal(np.asarray(sym)[:6], [0, 1, 0, 0, 1, 2])


def test_group_keys_unique():
    a = jnp.asarray([0, 0, 1], jnp.int32)
    b = jnp.asarray([1, 2, 1], jnp.int32)
    k = np.asarray(group_keys(a, b))
    assert len(set(k.tolist())) == 3
