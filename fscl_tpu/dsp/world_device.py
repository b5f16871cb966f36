"""Batched on-device WORLD-style (DIO) F0 extraction.

Role: the PARITY-DEFAULT pitch path. The reference extracts F0 with
pyworld (WORLD DIO + StoneMask; requirements.txt pyworld, used per
utterance in /root/reference/Parsers/template.py:57-65). Rounds 1-3
provided that contract as a host C++ tracker (cpp/world_pitch.cc) with a
numpy mirror (dsp/pitch.py:dio_f0); `yin_device` then proved the
batched-XLA pattern but changes the algorithm (WORLD-vs-YIN divergence:
median 0.19% voiced F0, BASELINE.md). This module runs the SAME DIO-style
algorithm as the host tracker, vectorized as one XLA call per wav-length
bucket, so the stored-feature default can ride the device at preprocess
throughput (VERDICT r3 #6).

Algorithm (mirroring dsp/pitch.py:dio_f0 step for step):
  1. anti-alias decimate to fs = sr/deci (Nuttall-windowed sinc),
  2. per octave band (boundary = fmin*sqrt(2) * sqrt(2)^k): low-pass, then
     four zero/peak-crossing interval trackers (y and dy, both signs),
     each linearly interpolated onto frame times; a band's candidate =
     mean of the four, scored by their normalized stddev,
  3. best-scored in-band candidate per frame; score > 0.12 -> unvoiced,
  4. contour fix: isolated voiced frames dropped, >20% jumps vs the
     previous (already-fixed) frame dropped unless the next frame agrees
     (a lax.scan - the host loop is sequential in the same way),
  5. refinement: normalized autocorrelation over taus in [0.85, 1.15] x
     the candidate period on the full-rate wav, parabolic peak, r >= 0.3
     voicing gate.

Vectorization notes: the crossing trackers are ragged on the host (one
entry per crossing); here every SAMPLE is a potential event with a
validity mask, event midpoints stay monotonic, so each tracker becomes
(sort by masked midpoint, searchsorted at frame times, gather two
neighbors, lerp) - exactly np.interp's clamped semantics. The refinement
uses masked fixed-size windows (max 3 periods at fmin) and a masked tau
range, so shapes stay static for XLA.

Numerics: f32 on device vs f64 on the host; parity is pinned by
tests/test_world_device.py (voiced-frame F0 within the yin_device
tolerance class, voicing agreement on non-boundary frames).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

_SCORE_GATE = 0.12
_JUMP = 0.2
_REFINE_R_GATE = 0.3


def _nuttall_sinc_np(cutoff_hz: float, fs: float) -> np.ndarray:
    """Same kernel as dsp/pitch.py:_nuttall_sinc (host f64; the taps are
    data, not traced)."""
    half = max(8, int(2.0 * fs / cutoff_hz))
    m = np.arange(-half, half + 1)
    fc = cutoff_hz / fs
    sinc = np.where(m == 0, 2 * fc, np.sin(2 * np.pi * fc * m)
                    / np.where(m == 0, 1.0, np.pi * m))
    t = np.linspace(0, 1, 2 * half + 1)
    w = (0.355768 - 0.487396 * np.cos(2 * np.pi * t)
         + 0.144232 * np.cos(4 * np.pi * t)
         - 0.012604 * np.cos(6 * np.pi * t))
    h = sinc * w
    return (h / h.sum()).astype(np.float32)


def _conv_same(x, h):
    """(B, N) (*) (k,) 'same' convolution via XLA conv."""
    import jax.numpy as jnp
    from jax import lax

    k = h.shape[0]
    return lax.conv_general_dilated(
        x[:, None, :], jnp.asarray(h, x.dtype)[None, None, ::-1],
        window_strides=(1,), padding=[((k - 1) // 2, k // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]


def _interp_track(sig, fs, negative, t_frames):
    """One crossing tracker as np.interp over event midpoints.

    sig: (B, N). Events live at samples i where the signed crossing
    happens; midpoint m_i = t_i + dt_i/2, value f_i = 1/dt_i with
    t_i = (i + frac_i)/fs and dt_i the gap to the NEXT crossing
    (dsp/pitch.py:_crossing_track). Returns ((B, F) interpolated track,
    (B,) track_valid with the host's >= 3 crossings requirement).
    """
    import jax.numpy as jnp

    B, N = sig.shape
    y0, y1 = sig[:, :-1], sig[:, 1:]
    if negative:
        cross = (y0 > 0) & (y1 <= 0)
    else:
        cross = (y0 < 0) & (y1 >= 0)
    denom = y0 - y1
    frac = jnp.where(jnp.abs(denom) > 1e-18, y0 / denom, 0.5)
    times = (jnp.arange(N - 1, dtype=jnp.float32) + frac) / fs  # (B, N-1)

    # time of the NEXT crossing after each event: running minimum of
    # masked times from the right
    masked_t = jnp.where(cross, times, jnp.inf)
    next_t = jnp.flip(jax.lax.cummin(jnp.flip(masked_t, -1), axis=1), -1)
    next_t = jnp.concatenate(
        [next_t[:, 1:], jnp.full((B, 1), jnp.inf, sig.dtype)], axis=-1)
    dt = next_t - times
    ok = cross & jnp.isfinite(dt) & (dt > 0)
    mid = jnp.where(ok, times + 0.5 * dt, jnp.inf)           # (B, N-1)
    freq = jnp.where(ok, 1.0 / jnp.maximum(dt, 1e-12), 0.0)

    # host contract: < 3 crossings -> the whole tracker is invalid. The
    # LAST crossing never yields an interval, so intervals >= 2 requires
    # crossings >= 3.
    track_valid = jnp.sum(ok, axis=-1) >= 2

    # np.interp over (mid, freq): sort events by midpoint (invalid ->
    # +inf sorts to the tail), searchsorted at the frame times, clamped
    # linear interpolation between the two neighbors
    order = jnp.argsort(mid, axis=-1)
    mid_s = jnp.take_along_axis(mid, order, axis=-1)
    freq_s = jnp.take_along_axis(freq, order, axis=-1)
    n_ev = jnp.sum(ok, axis=-1)                              # (B,)

    idx = jax.vmap(lambda m: jnp.searchsorted(m, t_frames))(mid_s)
    hi = jnp.clip(idx, 0, jnp.maximum(n_ev - 1, 0)[:, None])
    lo = jnp.clip(idx - 1, 0, jnp.maximum(n_ev - 1, 0)[:, None])
    m_lo = jnp.take_along_axis(mid_s, lo, axis=-1)
    m_hi = jnp.take_along_axis(mid_s, hi, axis=-1)
    f_lo = jnp.take_along_axis(freq_s, lo, axis=-1)
    f_hi = jnp.take_along_axis(freq_s, hi, axis=-1)
    span = m_hi - m_lo
    w = jnp.where(span > 1e-12,
                  (t_frames[None, :] - m_lo) / jnp.maximum(span, 1e-12),
                  0.0)
    w = jnp.clip(w, 0.0, 1.0)                                # clamp ends
    return f_lo + w * (f_hi - f_lo), track_valid


import jax  # noqa: E402  (after module docstring/helpers for clarity)
import jax.numpy as jnp  # noqa: E402


def world_f0_batched(wavs, lengths, sr: int = 22050, hop_length: int = 256,
                     fmin: float = 71.0, fmax: float = 800.0):
    """DIO-style F0 for a batch of wavs; 0.0 where unvoiced.

    wavs: (B, T) f32 zero-padded to the bucket; lengths: (B,) true sample
    counts. Returns (B, 1 + T//hop_length) f32, rows valid up to each
    wav's own frame count (padding frames forced unvoiced).
    """
    wavs = wavs.astype(jnp.float32)
    B, T = wavs.shape
    n_frames = 1 + T // hop_length

    deci = max(1, int(sr / (8.0 * fmax)))
    fs = sr / deci
    if deci > 1:
        x = _conv_same(wavs, _nuttall_sinc_np(0.4 * fs, sr))[:, ::deci]
    else:
        x = wavs
    frame_dt = hop_length / sr
    t_frames = (jnp.arange(n_frames, dtype=jnp.float32) * frame_dt)

    best_f0 = jnp.zeros((B, n_frames), jnp.float32)
    best_score = jnp.full((B, n_frames), jnp.inf, jnp.float32)
    boundary = fmin * np.sqrt(2.0)
    while boundary < fmax * 1.5:
        h = _nuttall_sinc_np(boundary, fs)
        if len(h) < x.shape[1]:
            y = _conv_same(x, h)
            dy = jnp.diff(y, append=y[:, -1:], axis=-1)
            ests, valids = [], []
            for sig, neg in ((y, True), (y, False), (dy, True), (dy, False)):
                e, v = _interp_track(sig, fs, neg, t_frames)
                ests.append(e)
                valids.append(v)
            est = jnp.stack(ests)                            # (4, B, F)
            band_ok = jnp.stack(valids).all(0)               # (B,)
            mean = est.mean(0)
            score = (jnp.sqrt(((est - mean) ** 2).sum(0) / 3.0)
                     / jnp.maximum(mean, 1e-9))
            valid = ((mean > boundary * 0.45) & (mean < boundary * 1.1)
                     & (mean >= fmin) & (mean <= fmax)
                     & (score < best_score) & band_ok[:, None])
            best_f0 = jnp.where(valid, mean, best_f0)
            best_score = jnp.where(valid, score, best_score)
        boundary *= np.sqrt(2.0)

    cand = jnp.where(best_score > _SCORE_GATE, 0.0, best_f0)

    # contour fix 1: isolated voiced frames
    prev = jnp.pad(cand[:, :-1], ((0, 0), (1, 0)))
    nxt = jnp.pad(cand[:, 1:], ((0, 0), (0, 1)))
    cand = jnp.where((cand > 0) & (prev <= 0) & (nxt <= 0), 0.0, cand)

    # contour fix 2 (sequential like the host loop): drop >20% jumps vs
    # the PREVIOUS FIXED frame unless the next (original) frame agrees
    def fix_step(prev_fixed, inp):
        f, nx = inp
        keep_anyway = (nx > 0) & (jnp.abs(f - nx) < _JUMP * jnp.maximum(
            f, 1e-9))
        jump = ((f > 0) & (prev_fixed > 0)
                & (jnp.abs(f - prev_fixed)
                   > _JUMP * jnp.maximum(prev_fixed, 1e-9)))
        out = jnp.where(jump & ~keep_anyway, 0.0, f)
        return out, out

    nxt2 = jnp.concatenate(
        [cand[:, 1:], jnp.zeros((B, 1), cand.dtype)], axis=-1)
    _, fixed_t = jax.lax.scan(
        fix_step, cand[:, 0], (cand.T[1:], nxt2.T[1:]))
    fixed = jnp.concatenate([cand[:, :1], fixed_t.T], axis=-1)

    # refinement: normalized autocorrelation around the candidate period
    # on the FULL-RATE wav (masked fixed-size window, masked tau range)
    tau_abs_max = int(sr / fmin)
    win_max = min(3 * tau_abs_max, T)
    period = sr / jnp.maximum(fixed, 1e-9)                   # (B, F)
    tau_lo = jnp.maximum(2, (period * 0.85).astype(jnp.int32))
    tau_hi = jnp.minimum((period * 1.15).astype(jnp.int32) + 1, tau_abs_max)
    win = jnp.minimum((3 * period).astype(jnp.int32),
                      lengths[:, None].astype(jnp.int32))
    win = jnp.minimum(win, win_max)
    n = lengths[:, None].astype(jnp.int32)
    start = jnp.clip(
        jnp.arange(n_frames)[None, :] * hop_length - win // 2, 0,
        jnp.maximum(0, n - win - tau_hi - 1))

    offs = jnp.arange(win_max)
    # a: (B, F, win_max) gathered window, masked beyond each frame's win
    gather_idx = jnp.clip(start[..., None] + offs, 0, T - 1)
    a = jnp.take_along_axis(
        wavs[:, None, :], gather_idx.reshape(B, -1)[:, None, :], axis=-1
    ).reshape(B, n_frames, win_max)
    wmask = offs[None, None, :] < win[..., None]
    a = jnp.where(wmask, a, 0.0)
    a_norm = jnp.sqrt(jnp.sum(a * a, axis=-1))               # (B, F)

    # tau candidates: a masked fixed range [tau_lo, tau_lo + R)
    R = int(np.ceil(tau_abs_max * 0.30)) + 2
    taus = tau_lo[..., None] + jnp.arange(R)                 # (B, F, R)
    tau_ok = taus <= tau_hi[..., None]

    def corr_at(shift):
        idx2 = jnp.clip(gather_idx + shift[..., None], 0, T - 1)
        b = jnp.take_along_axis(
            wavs[:, None, :], idx2.reshape(B, -1)[:, None, :], axis=-1
        ).reshape(B, n_frames, win_max)
        b = jnp.where(wmask, b, 0.0)
        num = jnp.sum(a * b, axis=-1)
        den = a_norm * jnp.sqrt(jnp.sum(b * b, axis=-1)) + 1e-12
        return num / den

    # stream over the R tau offsets (lax.map = scan): each step gathers
    # one (B, F, win_max) shifted window — a vmapped gather would
    # materialize (R, B, F, win_max) ~ GBs for full-length buckets
    r = jnp.moveaxis(
        jax.lax.map(lambda k: corr_at(taus[..., 0] + k), jnp.arange(R)),
        0, -1)                                               # (B, F, R)
    r = jnp.where(tau_ok, r, -jnp.inf)
    k_best = jnp.argmax(r, axis=-1)                          # (B, F)
    r_best = jnp.take_along_axis(r, k_best[..., None], -1)[..., 0]
    km1 = jnp.take_along_axis(r, jnp.maximum(k_best - 1, 0)[..., None],
                              -1)[..., 0]
    kp1 = jnp.take_along_axis(r, jnp.minimum(k_best + 1, R - 1)[..., None],
                              -1)[..., 0]
    interior = (k_best > 0) & (k_best < R - 1) \
        & jnp.isfinite(km1) & jnp.isfinite(kp1)
    denom = km1 - 2.0 * r_best + kp1
    shift = jnp.where(
        interior & (jnp.abs(denom) > 1e-12),
        jnp.clip(0.5 * (km1 - kp1) / denom, -1.0, 1.0), 0.0)
    tau_ref = (tau_lo + k_best).astype(jnp.float32) + shift
    f0r = sr / jnp.maximum(tau_ref, 1e-6)
    refined = jnp.where(
        (r_best >= _REFINE_R_GATE) & (f0r >= fmin) & (f0r <= fmax),
        f0r, 0.0)
    # host: win < 16 keeps the candidate unrefined
    out = jnp.where(fixed > 0, jnp.where(win < 16, fixed, refined), 0.0)

    frame_valid = (jnp.arange(n_frames)[None, :]
                   < 1 + lengths[:, None] // hop_length)
    return jnp.where(frame_valid, out, 0.0).astype(jnp.float32)


_batched_fns = {}


def get_world_device_fn(padded_len: int, sr: int, hop_length: int):
    """Cached jitted batched DIO for one wav-length bucket; (B, T) input."""
    key = (padded_len, sr, hop_length)
    if key not in _batched_fns:
        _batched_fns[key] = jax.jit(partial(
            world_f0_batched, sr=sr, hop_length=hop_length))
    return _batched_fns[key]


def world_f0_device(wav: np.ndarray, sr: int = 22050,
                    hop_length: int = 256) -> np.ndarray:
    """Single-utterance convenience wrapper (batch of 1, bucket-padded)."""
    from fscl_tpu.data.batch import bucket_len
    from fscl_tpu.dsp.preprocess import _WAV_BUCKETS

    n = len(wav)
    padded_len = bucket_len(n, _WAV_BUCKETS)
    padded = np.zeros((1, padded_len), np.float32)
    padded[0, :n] = wav
    fn = get_world_device_fn(padded_len, sr, hop_length)
    out = np.asarray(fn(jnp.asarray(padded), jnp.asarray([n])))
    return out[0, : 1 + n // hop_length]
