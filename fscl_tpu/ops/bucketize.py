"""TPU-native searchsorted / digitize as one compare-reduce fusion.

`jnp.searchsorted` (default binary-search method) and `jnp.digitize`
lower to a serial `while` loop on TPU. The round-4 train-step profile
measured the length-regulator + variance-bucketize searchsorted family at
~1.7 ms of a 14.8 ms full-size step (11.5%), running at ~1 GB/s effective
bandwidth — pure sequencing overhead.

Every sorted axis this framework searches is short (phoneme cumsum
boundaries L<=256, variance-quantization bin edges 255), so the
speed-of-light form is a broadcast compare + sum: O(L*T) trivially
parallel VPU work that XLA fuses into one reduce fusion, instead of
O(T log L) serial while-loop steps. Semantics are exactly
searchsorted(side="right") / numpy digitize over ascending bins.
"""
from __future__ import annotations

import jax.numpy as jnp


def searchsorted_right(sorted_ref: jnp.ndarray,
                       queries: jnp.ndarray) -> jnp.ndarray:
    """Vectorized `searchsorted(sorted_ref, queries, side="right")`.

    sorted_ref: (..., L), nondecreasing along the last axis.
    queries:    (..., T); leading dims broadcast against sorted_ref's.
    Returns int32 (..., T): #{l : sorted_ref[..., l] <= queries[..., t]},
    which for a sorted axis is the right-insertion index.
    """
    return jnp.sum(sorted_ref[..., :, None] <= queries[..., None, :],
                   axis=-2, dtype=jnp.int32)


def digitize(x: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """`numpy.digitize(x, edges)` for ascending 1-D `edges`: the index i
    with edges[i-1] <= x < edges[i] == #{e : edges[e] <= x}."""
    return jnp.sum(edges <= x[..., None], axis=-1, dtype=jnp.int32)
