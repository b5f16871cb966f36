"""Vocoder inference: JAX HiFi-GAN wrapper + Griffin-Lim fallback.

Replaces the reference's dlhlp_lib get_vocoder / LightningMelGAN
(baseline_saver.py:44-45, utils/tool.py:20-42). `Vocoder.from_checkpoint`
loads either an official torch HiFi-GAN generator checkpoint (converted via
models.hifigan.convert_torch_checkpoint) or a saved flax param pytree.
Griffin-Lim gives a weights-free synthesis path for smoke tests.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np


class Vocoder:
    def __init__(self, model, variables, kind: str = "HifiGAN",
                 fused: bool = True):
        # fused routes HiFiGAN through the MXU-dense serving ops
        # (ops/hifigan_fused.py); fused=False reproduces the module-apply
        # waveform exactly (for A/B against earlier outputs), same flag
        # as make_text2wav / make_streaming_text2wav.
        self.model = model
        self.variables = variables
        self.kind = kind
        self.fused = fused
        self._jitted = None

    @classmethod
    def from_checkpoint(cls, path: str, kind: str = "HifiGAN",
                        fused: bool = True) -> "Vocoder":
        """Load a torch generator checkpoint (official HiFi-GAN or
        melgan-neurips layout) or a saved flax param pytree.

        kind selects the architecture like the reference's model-YAML
        `vocoder.model` key ("HifiGAN" | "MelGAN",
        lightning/utils/tool.py:20-42)."""
        if kind.lower() == "melgan":
            from fscl_tpu.models.melgan import (
                MelGANGenerator, convert_torch_checkpoint,
            )
            model = MelGANGenerator()
        else:
            from fscl_tpu.models.hifigan import (
                HiFiGANGenerator, convert_torch_checkpoint,
            )
            model = HiFiGANGenerator()
        if path.endswith((".pt", ".pth", ".ckpt")):
            import torch
            sd = torch.load(path, map_location="cpu")
            if "generator" in sd:
                sd = sd["generator"]
            variables = convert_torch_checkpoint(sd)
        else:
            with open(path, "rb") as f:
                variables = pickle.load(f)
        return cls(model, variables, kind=kind, fused=fused)

    def infer(self, mel: np.ndarray) -> np.ndarray:
        """mel (T, n_mels) natural-log mel -> wav (T * 256,)."""
        import jax
        import jax.numpy as jnp
        if self._jitted is None:
            scale = float(np.log(10.0)) if self.kind.lower() == "melgan" \
                else 1.0
            # the reference feeds mel/ln(10) into MelGAN (tool.py:35)
            from fscl_tpu.ops.hifigan_fused import vocoder_apply
            apply = vocoder_apply(self.model, self.fused)
            self._jitted = jax.jit(
                lambda m: apply(self.variables, m / scale))
        wav = self._jitted(jnp.asarray(mel)[None])
        return np.asarray(wav)[0]


def griffin_lim(
    log_mel: np.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    n_iter: int = 32,
) -> np.ndarray:
    """Invert a log-mel spectrogram to a waveform (weights-free fallback)."""
    from fscl_tpu.ops.stft import mel_filterbank

    mel = np.exp(np.asarray(log_mel, np.float64))         # (T, n_mels)
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)    # (n_mels, F)
    # pseudo-inverse mel -> linear magnitude
    mag = np.maximum(mel @ np.linalg.pinv(fb).T, 1e-8)    # (T, F)
    T = mag.shape[0]
    length = T * hop_length

    rng = np.random.default_rng(0)
    angles = np.exp(2j * np.pi * rng.random(mag.shape))
    window = np.hanning(n_fft)

    def istft(spec):
        frames = np.fft.irfft(spec, n=n_fft, axis=1) * window
        out = np.zeros(length + n_fft)
        wsum = np.zeros(length + n_fft)
        for t in range(spec.shape[0]):
            s = t * hop_length
            out[s: s + n_fft] += frames[t]
            wsum[s: s + n_fft] += window ** 2
        out = out / np.maximum(wsum, 1e-8)
        return out[n_fft // 2: n_fft // 2 + length]

    def stft(wav):
        padded = np.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
        n_frames = 1 + (len(padded) - n_fft) // hop_length
        frames = np.stack([
            padded[t * hop_length: t * hop_length + n_fft] * window
            for t in range(n_frames)])
        return np.fft.rfft(frames, axis=1)

    spec = mag * angles
    for _ in range(n_iter):
        wav = istft(spec)
        new = stft(wav)
        new = new[: mag.shape[0]]
        angles = new / np.maximum(np.abs(new), 1e-8)
        spec = mag * angles
    wav = istft(spec)
    peak = np.max(np.abs(wav))
    return (wav / peak * 0.95 if peak > 0 else wav).astype(np.float32)
