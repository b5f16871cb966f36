"""Batched on-device DIO (dsp/world_device.py) vs the host dio_f0.

The device tracker runs the SAME DIO-style algorithm as the host numpy
mirror of cpp/world_pitch.cc (multi-band crossing candidates + sequential
contour fix + autocorrelation refinement), vectorized in f32. Pins:
(a) voiced-frame F0 agreement on synthetic speech-like signals,
(b) voicing-decision agreement, (c) true-F0 tracking, (d) batch
semantics (padding rows forced unvoiced, per-row == single-utterance),
(e) unvoiced noise/silence stays unvoiced. (VERDICT r3 #6.)
"""
import numpy as np

from fscl_tpu.dsp.pitch import dio_f0
from fscl_tpu.dsp.world_device import world_f0_batched, world_f0_device

SR = 22050
HOP = 256


def _tone(f0, dur_s, sr=SR, harmonics=4, seed=0):
    t = np.arange(int(dur_s * sr)) / sr
    rng = np.random.default_rng(seed)
    x = np.zeros_like(t)
    for h in range(1, harmonics + 1):
        x += np.sin(2 * np.pi * f0 * h * t) / h
    x += 0.01 * rng.standard_normal(len(t))
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def _segmented_signal(seed=1):
    rng = np.random.default_rng(seed)
    parts = []
    for i, f0 in enumerate([110.0, 220.0, 155.0, 330.0]):
        parts.append(_tone(f0, 0.5, seed=seed + i))
        parts.append(np.zeros(int(0.1 * SR), np.float32))
        parts.append((0.005 * rng.standard_normal(int(0.1 * SR))
                      ).astype(np.float32))
    return np.concatenate(parts)


def test_device_matches_host_dio_on_tones():
    for f0 in (110.0, 180.0, 320.0):
        wav = _tone(f0, 0.8, seed=int(f0))
        host = dio_f0(wav, SR, HOP)
        dev = world_f0_device(wav, SR, HOP)
        assert dev.shape == host.shape
        both = (host > 0) & (dev > 0)
        assert both.mean() > 0.85, f"voicing collapsed at {f0}"
        rel = np.abs(dev[both] - host[both]) / host[both]
        assert np.median(rel) < 1e-3, (f0, float(np.median(rel)))
        assert abs(np.median(dev[dev > 0]) - f0) / f0 < 0.02


def test_device_matches_host_on_segmented_signal():
    wav = _segmented_signal()
    host = dio_f0(wav, SR, HOP)
    dev = world_f0_device(wav, SR, HOP)
    agree = ((host > 0) == (dev > 0)).mean()
    assert agree > 0.93, f"voicing agreement {agree:.3f}"
    both = (host > 0) & (dev > 0)
    rel = np.abs(dev[both] - host[both]) / host[both]
    assert np.median(rel) < 2e-3, float(np.median(rel))
    assert np.quantile(rel, 0.9) < 0.02, float(np.quantile(rel, 0.9))


def test_unvoiced_stays_unvoiced():
    rng = np.random.default_rng(3)
    noise = (0.1 * rng.standard_normal(SR)).astype(np.float32)
    silence = np.zeros(SR, np.float32)
    for wav in (noise, silence):
        dev = world_f0_device(wav, SR, HOP)
        assert (dev > 0).mean() < 0.1


def test_batch_rows_match_single_runs():
    import jax.numpy as jnp

    wavs = [_tone(140.0, 0.6, seed=4), _tone(260.0, 0.45, seed=5)]
    T = max(len(w) for w in wavs)
    T = -(-T // 4096) * 4096
    padded = np.zeros((3, T), np.float32)     # row 2 = all-padding row
    lens = np.zeros(3, np.int32)
    for i, w in enumerate(wavs):
        padded[i, : len(w)] = w
        lens[i] = len(w)
    out = np.asarray(world_f0_batched(jnp.asarray(padded),
                                      jnp.asarray(lens), sr=SR,
                                      hop_length=HOP))
    assert (out[2] == 0).all()                # padding row unvoiced
    for i, w in enumerate(wavs):
        single = world_f0_device(w, SR, HOP)
        nf = len(single)
        row = out[i, :nf]
        both = (row > 0) & (single > 0)
        assert both.mean() > 0.8
        # same algorithm, same f32 device math; the only difference is
        # the bucket length (refinement windows clamp to the true length
        # on both paths), so rows agree to fp noise
        rel = np.abs(row[both] - single[both]) / single[both]
        assert np.median(rel) < 1e-4
        assert (out[i, nf:] == 0).all()       # padding frames unvoiced
