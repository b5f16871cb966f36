"""F0 (pitch) extraction + unvoiced interpolation.

Capability equivalent of the reference's pyworld (WORLD DIO) usage
(requirements.txt pyworld; Parsers/template.py wav_to_mel_energy_pitch):
frame-synchronous F0 at the mel hop (frame_period = hop/sr), 0 at unvoiced
frames, plus the "interpolate_pitch" variant with linear interpolation
across unvoiced gaps. Implementation is a YIN-style difference-function
tracker in numpy (the C++ path in cpp/pitch.cc provides the same contract
faster; this is the always-available fallback).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def yin_f0(
    wav: np.ndarray,
    sr: int = 22050,
    hop_length: int = 256,
    fmin: float = 71.0,
    fmax: float = 800.0,
    threshold: float = 0.15,
    frame_length: int = 1024,
) -> np.ndarray:
    """Frame-wise F0; 0.0 where unvoiced. len = 1 + len(wav)//hop_length
    (matches the mel frame count with centered STFT)."""
    wav = np.asarray(wav, dtype=np.float64)
    tau_min = max(2, int(sr / fmax))
    tau_max = min(frame_length - 1, int(sr / fmin))
    n_frames = 1 + len(wav) // hop_length
    half = frame_length // 2
    padded = np.pad(wav, (half, half + frame_length))

    # build frame matrix (n_frames, frame_length + tau_max)
    win = frame_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(win + tau_max)[None, :])
    frames = padded[idx]                                  # (F, win+tau_max)

    x0 = frames[:, :win]
    # difference function d(tau) computed via cumulative formulation
    # d(tau) = sum_t (x[t] - x[t+tau])^2
    e0 = np.sum(x0 ** 2, axis=1, keepdims=True)
    d = np.empty((n_frames, tau_max + 1))
    d[:, 0] = 0.0
    # vectorized over tau (tau_max ~ 310 at 22.05k): correlation per shift
    for tau in range(1, tau_max + 1):
        xt = frames[:, tau: tau + win]
        corr = np.einsum("ft,ft->f", x0, xt)
        et = np.sum(xt ** 2, axis=1)
        d[:, tau] = e0[:, 0] + et - 2 * corr
    # cumulative mean normalized difference
    cum = np.cumsum(d[:, 1:], axis=1)
    taus = np.arange(1, tau_max + 1)
    cmnd = d[:, 1:] * taus / np.maximum(cum, 1e-12)
    cmnd = np.concatenate([np.ones((n_frames, 1)), cmnd], axis=1)

    f0 = np.zeros(n_frames)
    for f in range(n_frames):
        row = cmnd[f, tau_min: tau_max + 1]
        below = np.where(row < threshold)[0]
        if len(below):
            tau = below[0] + tau_min
            # walk to local minimum
            while tau + 1 <= tau_max and cmnd[f, tau + 1] < cmnd[f, tau]:
                tau += 1
        else:
            tau = int(np.argmin(row)) + tau_min
            if row.min() > 0.7:     # clearly unvoiced
                continue
        # parabolic interpolation around tau
        if 1 < tau < tau_max:
            a, b, c = cmnd[f, tau - 1], cmnd[f, tau], cmnd[f, tau + 1]
            denom = a - 2 * b + c
            shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            tau_refined = tau + np.clip(shift, -1, 1)
        else:
            tau_refined = float(tau)
        f0[f] = sr / tau_refined
    f0[(f0 < fmin) | (f0 > fmax)] = 0.0
    return f0.astype(np.float32)


def interpolate_f0(f0: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Linear interpolation over unvoiced (0) regions; returns
    (interpolated, voiced_mask). Matches dlhlp_lib's interpolate used for
    the `interpolate_pitch` feature."""
    f0 = np.asarray(f0, dtype=np.float32)
    voiced = f0 > 0
    if not voiced.any():
        return f0.copy(), voiced
    x = np.arange(len(f0))
    interp = np.interp(x, x[voiced], f0[voiced]).astype(np.float32)
    return interp, voiced


def extract_pitch(wav, sr: int = 22050, hop_length: int = 256,
                  use_cpp: bool = True):
    """Dispatch: C++ kernel if built, numpy YIN otherwise."""
    if use_cpp:
        try:
            from fscl_tpu.dsp.cpp_bindings import cpp_yin_f0
            return cpp_yin_f0(wav, sr, hop_length)
        except (ImportError, OSError):
            pass
    return yin_f0(wav, sr, hop_length)
