"""WORLD-style (DIO + refinement) F0 extraction golden tests.

The reference extracts F0 with pyworld DIO+StoneMask (requirements.txt:12,
Parsers/template.py wav_to_mel_energy_pitch). pyworld isn't installable here
(zero egress), so parity is pinned on signals with KNOWN ground-truth F0:
steady tones, harmonic-rich sawtooth, chirps, and unvoiced noise — plus
agreement between the C++ kernel and the numpy mirror.
"""
import numpy as np
import pytest

from fscl_tpu.dsp.pitch import dio_f0, extract_pitch, yin_f0

SR = 22050
HOP = 256


def harmonic(f0, dur=1.0, n_harm=8, sr=SR, decay=0.7):
    t = np.arange(int(dur * sr)) / sr
    x = sum((decay ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t)
            for k in range(n_harm))
    return (x / np.abs(x).max()).astype(np.float32)


def _voiced_err(f0_track, truth_hz, lo=10, hi=-10):
    core = f0_track[lo:hi]
    voiced = core[core > 0]
    assert len(voiced) > 0.8 * len(core), "mostly voiced expected"
    return np.abs(voiced - truth_hz) / truth_hz


@pytest.mark.parametrize("truth", [110.0, 220.0, 440.0])
def test_pure_tone(truth):
    t = np.arange(SR) / SR
    wav = np.sin(2 * np.pi * truth * t).astype(np.float32)
    for fn in (dio_f0,):
        err = _voiced_err(fn(wav, SR, HOP), truth)
        assert np.median(err) < 0.01, f"{fn.__name__}: {np.median(err)}"


@pytest.mark.parametrize("truth", [130.0, 260.0])
def test_harmonic_rich(truth):
    wav = harmonic(truth)
    err = _voiced_err(dio_f0(wav, SR, HOP), truth)
    # harmonically rich signals are where naive trackers octave-error
    assert np.median(err) < 0.02


def test_chirp_tracks():
    t = np.arange(SR) / SR
    # 120 -> 360 Hz linear chirp: instantaneous f = 120 + 240 * t
    phase = 2 * np.pi * (120 * t + 120 * t ** 2)
    wav = np.sin(phase).astype(np.float32)
    f0 = dio_f0(wav, SR, HOP)
    frames = np.arange(len(f0)) * HOP / SR
    truth = 120 + 240 * frames
    core = slice(10, -10)
    voiced = f0[core] > 0
    assert voiced.mean() > 0.7
    rel = np.abs(f0[core][voiced] - truth[core][voiced]) / truth[core][voiced]
    assert np.median(rel) < 0.05


def test_unvoiced_noise_mostly_zero():
    rng = np.random.default_rng(0)
    wav = rng.normal(size=SR).astype(np.float32)
    f0 = dio_f0(wav, SR, HOP)
    assert (f0 > 0).mean() < 0.2


def test_silence_zero():
    f0 = dio_f0(np.zeros(SR, np.float32), SR, HOP)
    assert np.all(f0 == 0)


def test_voiced_unvoiced_segmentation():
    rng = np.random.default_rng(1)
    seg_v = harmonic(200, dur=0.5)
    seg_u = 0.05 * rng.normal(size=int(0.3 * SR)).astype(np.float32)
    wav = np.concatenate([seg_u, seg_v, seg_u])
    f0 = dio_f0(wav, SR, HOP)
    n_u = int(0.3 * SR) // HOP
    assert (f0[5:n_u - 5] > 0).mean() < 0.4
    mid = f0[n_u + 5: n_u + int(0.5 * SR) // HOP - 5]
    assert (mid > 0).mean() > 0.8
    assert np.median(np.abs(mid[mid > 0] - 200) / 200) < 0.02


def test_cpp_matches_numpy():
    pytest.importorskip("ctypes")
    try:
        from fscl_tpu.dsp.cpp_bindings import cpp_world_f0
        wav = harmonic(180, dur=0.8)
        cpp = cpp_world_f0(wav, SR, HOP)
    except Exception:
        pytest.skip("C++ toolchain unavailable")
    ref = dio_f0(wav, SR, HOP)
    both = (cpp > 0) & (ref > 0)
    assert both.mean() > 0.7
    assert np.median(np.abs(cpp[both] - ref[both]) / ref[both]) < 0.02


def test_extract_pitch_method_dispatch():
    wav = harmonic(150, dur=0.5)
    w = extract_pitch(wav, SR, HOP, method="world")
    y = extract_pitch(wav, SR, HOP, method="yin")
    assert len(w) == len(y) == 1 + len(wav) // HOP
    for f0 in (w, y):
        v = f0[5:-5][f0[5:-5] > 0]
        assert np.median(np.abs(v - 150) / 150) < 0.03


def test_world_vs_yin_divergence_speechlike():
    """Record-keeping test: the two algorithms agree on clean voiced speech
    within a few percent (divergence documented in BASELINE.md)."""
    rng = np.random.default_rng(2)
    segs = []
    for f0 in (120, 170, 210, 95):
        segs.append(harmonic(f0, dur=0.3))
        segs.append(0.02 * rng.normal(size=int(0.05 * SR)).astype(np.float32))
    wav = np.concatenate(segs)
    w = dio_f0(wav, SR, HOP)
    y = yin_f0(wav, SR, HOP)
    both = (w > 0) & (y > 0)
    assert both.mean() > 0.5
    rel = np.abs(w[both] - y[both]) / y[both]
    assert np.median(rel) < 0.03
