"""Ragged segmental reductions, vectorized.

The reference reduces SSL frame representations into per-phoneme queries with
nested Python loops over utterances and segments
(lightning/model/reduction.py:62-82 `PhonemeQueryExtractor`,
reduction.py:13-40 `SegmentationLevelAverage`). On TPU these become two
scatter-adds over statically-shaped tensors:

  stage 1 (segment mean):  frame t belongs to segment j(t) = searchsorted
      (cumsum durations); segment_sum over (B*L) ids, divide by counts.
  stage 2 (class mean):    scatter-add segment means into the symbol table by
      phoneme id, divide by per-symbol counts; empty symbols -> zeros
      (matching AverageReductionModule's zero default).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fscl_tpu.ops.bucketize import searchsorted_right


def segment_mean(
    reprs: jnp.ndarray,       # (B, T, ...) frame features
    durations: jnp.ndarray,   # (B, L) int frames per segment
) -> jnp.ndarray:
    """Per-segment mean. Returns (B, L, ...); zero for empty segments.

    Vectorized equivalent of SegmentationLevelAverage (reduction.py:13-40).
    NaN frames are zeroed first (the reference zeroes NaN segments;
    SoftMultiAttCodebook2 also zeroes NaNs at entry, embeddings.py:115).
    """
    B, T = reprs.shape[:2]
    L = durations.shape[1]
    durations = durations.astype(jnp.int32)
    reprs = jnp.nan_to_num(reprs)

    csum = jnp.cumsum(durations, axis=-1)                     # (B, L)
    total = csum[:, -1]
    t = jnp.arange(T, dtype=jnp.int32)
    seg_id = searchsorted_right(csum, t)               # (B, T)
    in_range = t[None, :] < total[:, None]
    # out-of-range frames go to a trash segment L
    seg_id = jnp.where(in_range, jnp.clip(seg_id, 0, L - 1), L)

    flat_id = (seg_id + (jnp.arange(B, dtype=jnp.int32) * (L + 1))[:, None]).reshape(-1)
    flat = reprs.reshape((B * T,) + reprs.shape[2:])
    sums = jax.ops.segment_sum(flat, flat_id, num_segments=B * (L + 1))
    sums = sums.reshape((B, L + 1) + reprs.shape[2:])[:, :L]
    counts = jnp.maximum(durations, 1).astype(sums.dtype)
    out = sums / counts.reshape((B, L) + (1,) * (reprs.ndim - 2))
    return jnp.where(
        (durations > 0).reshape((B, L) + (1,) * (reprs.ndim - 2)), out, 0.0
    )


def phoneme_query_sums(
    reprs: jnp.ndarray,        # (B, T, n_layers, D) SSL frame features
    durations: jnp.ndarray,    # (B, L) avg_frames
    phonemes: jnp.ndarray,     # (B, L) int phoneme ids
    n_symbols: int,
):
    """Per-symbol (sum, count) of segment means — the accumulable form of
    phoneme query extraction, so tune flows can stream batches
    (tune/FastSpeech2Tune.py:42-83 processes the whole few-shot split)."""
    seg_means = segment_mean(reprs, durations)        # (B, L, n_layers, D)
    B, L = seg_means.shape[:2]
    present = (durations > 0)
    ids = jnp.where(present, phonemes.astype(jnp.int32), n_symbols).reshape(-1)
    flat = seg_means.reshape((B * L,) + seg_means.shape[2:])
    sums = jax.ops.segment_sum(flat, ids, num_segments=n_symbols + 1)[:n_symbols]
    counts = jax.ops.segment_sum(
        present.astype(jnp.float32).reshape(-1), ids, num_segments=n_symbols + 1
    )[:n_symbols]
    return sums, counts


def queries_from_sums(sums: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    n_symbols = sums.shape[0]
    shape = (n_symbols,) + (1,) * (sums.ndim - 1)
    out = sums / jnp.maximum(counts, 1.0).reshape(shape)
    out = jnp.where((counts > 0).reshape(shape), out, 0.0)
    return out[None]


def phoneme_query_extract(
    reprs: jnp.ndarray,        # (B, T, n_layers, D) SSL frame features
    durations: jnp.ndarray,    # (B, L) avg_frames
    phonemes: jnp.ndarray,     # (B, L) int phoneme ids
    n_symbols: int,
) -> jnp.ndarray:
    """Two-stage phoneme query extraction ("average" mode).

    Equivalent to PhonemeQueryExtractor(mode="average", two_stage=True)
    (reduction.py:42-82): per-segment mean then per-symbol mean over all
    segments in the batch with that phoneme id. Output (1, n_symbols,
    n_layers, D); symbols never observed are zero.
    """
    sums, counts = phoneme_query_sums(reprs, durations, phonemes, n_symbols)
    return queries_from_sums(sums, counts)


def frame_phoneme_query_extract(
    reprs: jnp.ndarray,
    durations: jnp.ndarray,
    phonemes: jnp.ndarray,
    n_symbols: int,
) -> jnp.ndarray:
    """Single-stage ("two_stage=False") variant: class mean over raw frames
    (reduction.py:70-77 else-branch). Frames are weighted equally, so this is
    a duration-weighted mean of frames per symbol."""
    B, T = reprs.shape[:2]
    L = durations.shape[1]
    durations = durations.astype(jnp.int32)
    reprs = jnp.nan_to_num(reprs)
    csum = jnp.cumsum(durations, axis=-1)
    total = csum[:, -1]
    t = jnp.arange(T, dtype=jnp.int32)
    seg_id = searchsorted_right(csum, t)
    in_range = t[None, :] < total[:, None]
    seg_id_c = jnp.clip(seg_id, 0, L - 1)
    phn = jnp.take_along_axis(phonemes.astype(jnp.int32), seg_id_c, axis=1)
    ids = jnp.where(in_range, phn, n_symbols).reshape(-1)
    flat = reprs.reshape((B * T,) + reprs.shape[2:])
    sums = jax.ops.segment_sum(flat, ids, num_segments=n_symbols + 1)[:n_symbols]
    counts = jax.ops.segment_sum(
        in_range.astype(jnp.float32).reshape(-1), ids, num_segments=n_symbols + 1
    )[:n_symbols]
    out = sums / jnp.maximum(counts, 1.0).reshape((n_symbols,) + (1,) * (flat.ndim - 1))
    out = jnp.where((counts > 0).reshape((n_symbols,) + (1,) * (flat.ndim - 1)), out, 0.0)
    return out[None]
