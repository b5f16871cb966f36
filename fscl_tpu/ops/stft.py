"""STFT / mel-spectrogram / energy as pure XLA ops.

The reference extracts mel/energy on CPU through librosa + dlhlp_lib
(`Parsers/template.py:57-65`, TacotronSTFT-style processing: reflect-padded
centered STFT, Hann window, slaney-normalized mel filterbank, log dynamic
range compression with clamp 1e-5; energy = L2 norm of the magnitude frame).
Here the whole chain is jittable XLA (rfft on device), batched, so
preprocessing and on-the-fly "mel upstream" features run on TPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False default)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_mels, n_fft//2+1).

    Numerically equivalent to librosa.filters.mel(htk=False, norm='slaney'),
    which is what the reference's preprocessing uses.
    """
    fftfreqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def frame_signal(
    wav: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True
) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_fft) with reflect pad when centered."""
    if center:
        pad = [(0, 0)] * (wav.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        wav = jnp.pad(wav, pad, mode="reflect")
    T = wav.shape[-1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    return wav[..., idx]


def stft_magnitude(
    wav: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
) -> jnp.ndarray:
    """Magnitude spectrogram (..., n_frames, n_fft//2+1)."""
    frames = frame_signal(wav, n_fft, hop_length, center)
    win = hann_window(win_length, dtype=frames.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return jnp.abs(spec)


def mel_spectrogram(
    wav: jnp.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    clip_val: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Log-mel spectrogram + frame energy.

    Returns (mel (..., n_frames, n_mels), energy (..., n_frames)); energy is
    the L2 norm of each magnitude frame, matching the reference's energy
    feature (dlhlp_lib tts_preprocess via Parsers/template.py:57-65).
    """
    mag = stft_magnitude(wav, n_fft, hop_length, win_length)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("...tf,mf->...tm", mag, fb, preferred_element_type=jnp.float32)
    mel = jnp.log(jnp.clip(mel, clip_val, None))
    energy = jnp.linalg.norm(mag, axis=-1)
    return mel, energy
