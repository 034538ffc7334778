"""Deterministic RNG — replaces the reference's `set_seed`
(reference src/utils/utils.py:34-41: torch manual_seed + CUBLAS workspace env
+ deterministic algorithms).  JAX PRNG keys are counter-based and
deterministic by construction, so the equivalent here is a thin stateful
splitter plus a process-level seed for the host-side (numpy / random) pieces
of the data pipeline.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs and return a root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)


class RNG:
    """Stateful convenience splitter around a JAX PRNG key.

    Use at setup time only (init, data shuffling); inside jit'd code pass
    explicit keys.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
