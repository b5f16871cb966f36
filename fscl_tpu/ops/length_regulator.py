"""Length regulator as a static-shape gather.

The reference expands phoneme hidden states by per-phoneme durations with a
Python loop over the batch and a `torch.cat` of `expand`s
(lightning/model/modules.py:169-196) — dynamic shapes, host control flow.

TPU-native design: for each output frame t we need the index of the phoneme
whose cumulative-duration interval contains t:

    j(t) = #{ l : cumsum(durations)[l] <= t }

which is a vectorized `searchsorted` over the (monotone) cumsum — one gather,
static output length, no data-dependent shapes. Frames beyond the total
length map out-of-range and are zeroed.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fscl_tpu.ops.bucketize import searchsorted_right


@jax.custom_vjp
def _gather_expand(x, idx, valid):
    """out[b, t] = x[b, idx[b, t]] where valid, else 0."""
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    return jnp.where(valid[..., None], out, jnp.zeros((), dtype=x.dtype))


def _gather_expand_fwd(x, idx, valid):
    return _gather_expand(x, idx, valid), (idx, valid, x.shape[1])


def _gather_expand_bwd(res, g):
    # The natural VJP of a repeated-index gather is a scatter-add, which XLA
    # lowers to a slow serialized op on TPU. grad_x[b,l] = sum_t
    # [idx[b,t]==l] g[b,t] is a segment sum == one one-hot matmul that rides
    # the MXU instead (B*T*L*D MACs, trivial next to the conv-FFNs).
    idx, valid, L = res
    onehot = ((idx[..., None] == jnp.arange(L, dtype=idx.dtype))
              & valid[..., None]).astype(g.dtype)       # (B, T, L)
    grad_x = jnp.einsum("btl,btd->bld", onehot, g)
    zero = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return grad_x, zero(idx), zero(valid)


_gather_expand.defvjp(_gather_expand_fwd, _gather_expand_bwd)


def regulate_lengths(
    x: jnp.ndarray,            # (B, L, D) phoneme-level features
    durations: jnp.ndarray,    # (B, L) int frame counts (>= 0)
    max_mel_len: int,          # static output length
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand x by durations. Returns (out (B, max_mel_len, D), mel_len (B,)).

    Semantics match LengthRegulator.LR (modules.py:169-196): frame t of
    sample b is a copy of x[b, j] where j is the phoneme covering t; output
    rows past the total duration are zero (reference pads with zeros).
    The backward pass uses a custom MXU-friendly segment-sum VJP.
    """
    durations = durations.astype(jnp.int32)
    csum = jnp.cumsum(durations, axis=-1)              # (B, L)
    mel_len = csum[:, -1]                              # (B,)
    t = jnp.arange(max_mel_len, dtype=jnp.int32)       # (T,)

    # frame -> phoneme index: number of boundaries <= t. One compare-reduce
    # fusion; jnp.searchsorted's binary search is a serial while on TPU
    # (ops/bucketize.py).
    idx = searchsorted_right(csum, t)                  # (B, T)
    valid = t[None, :] < mel_len[:, None]
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    out = _gather_expand(x, idx, valid)
    return out, mel_len


def gather_frame_labels(
    labels: jnp.ndarray,       # (B, L) int per-phoneme labels
    durations: jnp.ndarray,    # (B, L) int frame counts
    max_mel_len: int,
    pad_value: int = 0,
) -> jnp.ndarray:
    """Expand per-phoneme labels to per-frame labels (used by PR datasets,
    reference lightning/datasets/phoneme_recognition/PRDataset.py)."""
    durations = durations.astype(jnp.int32)
    csum = jnp.cumsum(durations, axis=-1)
    mel_len = csum[:, -1]
    t = jnp.arange(max_mel_len, dtype=jnp.int32)
    idx = searchsorted_right(csum, t)
    valid = t[None, :] < mel_len[:, None]
    idx = jnp.clip(idx, 0, labels.shape[1] - 1)
    out = jnp.take_along_axis(labels, idx, axis=1)
    return jnp.where(valid, out, jnp.asarray(pad_value, dtype=labels.dtype))
