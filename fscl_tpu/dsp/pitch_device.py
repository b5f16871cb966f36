"""Batched on-device F0 extraction (YIN) for the preprocessing pipeline.

Role: the reference extracts F0 on the host per utterance (pyworld in
Parsers/template.py's wav_to_mel_energy_pitch); our default parity path is
the C++ DIO-style tracker (cpp/world_pitch.cc). On a 1-vCPU TPU host that
host pitch pass dominates batched preprocessing (~87 ms per 5 s utterance,
BASELINE.md round-3). This module moves the whole tracker onto the TPU as
ONE batched XLA call per wav-length bucket:

  - difference function d(tau) for every frame via FFT cross-correlation
    (rfft/irfft -> MXU-friendly, no per-tau host loop),
  - cumulative-mean-normalized difference (CMND),
  - the exact YIN decision rule of dsp/pitch.py:yin_f0 (first threshold
    crossing, walk to local minimum, argmin fallback with the 0.7
    unvoiced gate) vectorized with masked argmax/argmin,
  - parabolic interpolation around the chosen lag.

Numerics: f32 on device vs the numpy/C++ f64 host paths; voiced-frame F0
agrees with yin_f0 to <0.1% and voicing decisions flip only on
threshold-straddling frames (pinned by tests/test_pitch_device.py).
Select with pitch_method="yin_device" (preprocess YAML:
preprocessing.pitch.method) — the stored feature then follows YIN
semantics (BASELINE.md quantifies WORLD-vs-YIN divergence at median
0.19% voiced-frame F0).
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import numpy as np

# YIN constants shared with dsp/pitch.py:yin_f0
_FRAME_LENGTH = 1024
_THRESHOLD = 0.15


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def yin_f0_batched(wavs, lengths, sr: int = 22050, hop_length: int = 256,
                   fmin: float = 71.0, fmax: float = 800.0,
                   threshold: float = _THRESHOLD,
                   frame_length: int = _FRAME_LENGTH):
    """Frame-wise F0 for a batch of wavs; 0.0 where unvoiced.

    wavs: (B, T) f32 (zero-padded to the bucket); lengths: (B,) true
    sample counts. Returns (B, 1 + T//hop_length) f32 — rows are valid up
    to each wav's own 1 + n//hop frames, zero beyond (padding frames are
    forced unvoiced via the frame-validity mask, not left to numerics).
    """
    import jax.numpy as jnp

    wavs = wavs.astype(jnp.float32)
    B, T = wavs.shape
    tau_min = max(2, int(sr / fmax))
    tau_max = min(frame_length - 1, int(sr / fmin))
    n_frames = 1 + T // hop_length
    half = frame_length // 2
    win = frame_length
    span = win + tau_max

    padded = jnp.pad(wavs, ((0, 0), (half, half + frame_length)))
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(span)[None, :])                    # (F, span)
    frames = padded[:, idx]                                # (B, F, span)

    # d(tau) = e0 + e_tau - 2*c(tau) with c via FFT cross-correlation:
    # c(tau) = sum_t x0[t] * frames[t+tau],  x0 = frames[:, :, :win]
    nfft = _next_pow2(span)
    x0 = frames[:, :, :win]
    fa = jnp.fft.rfft(frames, n=nfft)
    fb = jnp.fft.rfft(x0, n=nfft)
    corr = jnp.fft.irfft(jnp.conj(fb) * fa, n=nfft)[..., : tau_max + 1]

    sq = jnp.cumsum(frames ** 2, axis=-1)
    sq = jnp.pad(sq, ((0, 0), (0, 0), (1, 0)))             # prefix sums
    taus_all = jnp.arange(tau_max + 1)
    # e_tau = sum frames[tau:tau+win]^2 = sq[tau+win] - sq[tau]
    e_tau = sq[:, :, taus_all + win] - sq[:, :, taus_all]
    e0 = e_tau[:, :, :1]
    d = jnp.maximum(e0 + e_tau - 2.0 * corr, 0.0)

    # cumulative mean normalized difference; cmnd[0] = 1
    cum = jnp.cumsum(d[:, :, 1:], axis=-1)
    taus = jnp.arange(1, tau_max + 1, dtype=jnp.float32)
    cmnd = d[:, :, 1:] * taus / jnp.maximum(cum, 1e-12)
    cmnd = jnp.concatenate(
        [jnp.ones((B, n_frames, 1), cmnd.dtype), cmnd], axis=-1)

    lag = jnp.arange(tau_max + 1)
    in_range = (lag >= tau_min) & (lag <= tau_max)         # (tau,)

    # --- decision rule (vectorized yin_f0) ---
    below = (cmnd < threshold) & in_range
    any_below = jnp.any(below, axis=-1)                    # (B, F)
    first_below = jnp.argmax(below, axis=-1)               # first True

    # walk to local minimum: first tau >= first_below where
    # cmnd[tau+1] >= cmnd[tau] (stop condition; tau_max always stops)
    nxt = jnp.concatenate(
        [cmnd[:, :, 1:], jnp.full((B, n_frames, 1), jnp.inf)], axis=-1)
    stop = nxt >= cmnd                                     # (B, F, tau)
    walk_mask = stop & (lag >= first_below[..., None]) & (lag <= tau_max)
    tau_walked = jnp.argmax(walk_mask, axis=-1)

    # argmin fallback over [tau_min, tau_max]
    masked = jnp.where(in_range, cmnd, jnp.inf)
    tau_argmin = jnp.argmin(masked, axis=-1)
    row_min = jnp.min(masked, axis=-1)
    clearly_unvoiced = (~any_below) & (row_min > 0.7)

    tau = jnp.where(any_below, tau_walked, tau_argmin)     # (B, F)

    # parabolic interpolation around tau (only for 1 < tau < tau_max)
    tm1 = jnp.take_along_axis(cmnd, (tau - 1)[..., None], axis=-1)[..., 0]
    t0 = jnp.take_along_axis(cmnd, tau[..., None], axis=-1)[..., 0]
    tp1 = jnp.take_along_axis(
        cmnd, jnp.minimum(tau + 1, tau_max)[..., None], axis=-1)[..., 0]
    denom = tm1 - 2.0 * t0 + tp1
    shift = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (tm1 - tp1) / denom, 0.0)
    shift = jnp.clip(shift, -1.0, 1.0)
    interior = (tau > 1) & (tau < tau_max)
    tau_refined = jnp.where(interior, tau + shift, tau).astype(jnp.float32)

    f0 = sr / jnp.maximum(tau_refined, 1e-6)
    f0 = jnp.where(clearly_unvoiced, 0.0, f0)
    f0 = jnp.where((f0 < fmin) | (f0 > fmax), 0.0, f0)

    # frame validity: frame f belongs to wav rows with 1 + n//hop > f
    valid = (jnp.arange(n_frames)[None, :]
             < 1 + lengths[:, None] // hop_length)
    return jnp.where(valid, f0, 0.0).astype(jnp.float32)


_batched_fns = {}


def get_yin_device_fn(padded_len: int, sr: int, hop_length: int):
    """Cached jitted batched YIN for one wav-length bucket; (B, T) input."""
    import jax

    key = (padded_len, sr, hop_length)
    if key not in _batched_fns:
        _batched_fns[key] = jax.jit(partial(
            yin_f0_batched, sr=sr, hop_length=hop_length))
    return _batched_fns[key]


def yin_f0_device(wav: np.ndarray, sr: int = 22050,
                  hop_length: int = 256) -> np.ndarray:
    """Single-utterance convenience wrapper (batch of 1, bucket-padded)."""
    import jax.numpy as jnp

    from fscl_tpu.data.batch import bucket_len
    from fscl_tpu.dsp.preprocess import _WAV_BUCKETS

    n = len(wav)
    padded_len = bucket_len(n, _WAV_BUCKETS)
    padded = np.zeros((1, padded_len), np.float32)
    padded[0, :n] = wav
    fn = get_yin_device_fn(padded_len, sr, hop_length)
    out = np.asarray(fn(jnp.asarray(padded), jnp.asarray([n])))
    return out[0, : 1 + n // hop_length]
