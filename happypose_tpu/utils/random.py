"""RNG discipline.

Parity target: /root/reference/happypose/toolbox/utils/random.py:30-65
(`make_seed` hash, `temp_numpy_seed`, `get_unique_seed`) — mapped onto JAX's
explicit key model: derive keys by folding structured data into a root key.
"""

from __future__ import annotations

import contextlib
import hashlib
from typing import Iterator

import jax
import numpy as np


def make_seed(*args) -> int:
    """Deterministic 31-bit seed from arbitrary hashable args."""
    h = hashlib.sha256("/".join(str(a) for a in args).encode()).digest()
    return int.from_bytes(h[:4], "little") & 0x7FFFFFFF


def key_for(*args) -> jax.Array:
    """A PRNG key derived from structured data (host + epoch + step ...)."""
    return jax.random.PRNGKey(make_seed(*args))


@contextlib.contextmanager
def temp_numpy_seed(seed: int) -> Iterator[None]:
    state = np.random.get_state()
    np.random.seed(seed)
    try:
        yield
    finally:
        np.random.set_state(state)
