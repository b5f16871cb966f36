"""PRNG discipline.

The reference relies on `pl.seed_everything(43)` plus a `seed_all` context
manager (`lightning/utils/tool.py`) for reproducible task sampling. Here we
make seeds explicit: a `RngStream` hands out fresh `jax.random` keys, and
`py_rng(seed)` gives a deterministic `random.Random` for host-side sampling
(episodic tasks), so replays are bit-reproducible across hosts.
"""
from __future__ import annotations

import random
from typing import Iterator

import jax
import numpy as np


class RngStream:
    """A splittable stream of JAX PRNG keys."""

    def __init__(self, seed: int = 43):
        self._key = jax.random.PRNGKey(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs


def py_rng(seed: int = 43) -> random.Random:
    return random.Random(seed)


def np_rng(seed: int = 43) -> np.random.Generator:
    return np.random.default_rng(seed)
