"""Batched on-device YIN (dsp/pitch_device.py) vs the host yin_f0.

The device tracker re-implements yin_f0's exact decision rule in
vectorized f32; these tests pin (a) voiced-frame F0 agreement on
synthetic speech-like signals, (b) voicing-decision agreement, (c) batch
semantics: padding rows/frames forced unvoiced, per-row results equal to
single-utterance runs.
"""
import numpy as np
import pytest

from fscl_tpu.dsp.pitch import yin_f0
from fscl_tpu.dsp.pitch_device import yin_f0_batched, yin_f0_device

SR = 22050
HOP = 256


def _tone(f0, dur_s, sr=SR, harmonics=3, seed=0):
    t = np.arange(int(dur_s * sr)) / sr
    rng = np.random.default_rng(seed)
    x = np.zeros_like(t)
    for h in range(1, harmonics + 1):
        x += np.sin(2 * np.pi * f0 * h * t) / h
    x += 0.01 * rng.standard_normal(len(t))
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def _segmented_signal(seed=1):
    """Voiced segments at several F0s separated by silence/noise gaps."""
    rng = np.random.default_rng(seed)
    parts = []
    for i, f0 in enumerate([110.0, 220.0, 155.0, 330.0]):
        parts.append(_tone(f0, 0.5, harmonics=4, seed=seed + i))
        parts.append(np.zeros(int(0.1 * SR), np.float32))
        parts.append((0.005 * rng.standard_normal(int(0.1 * SR))
                      ).astype(np.float32))
    return np.concatenate(parts)


def test_device_matches_host_yin_on_tones():
    for f0 in (110.0, 220.0, 440.0):
        wav = _tone(f0, 0.8, seed=int(f0))
        host = yin_f0(wav, SR, HOP)
        dev = yin_f0_device(wav, SR, HOP)
        assert dev.shape == host.shape
        both = (host > 0) & (dev > 0)
        assert both.mean() > 0.9, f"voicing collapsed at {f0}"
        rel = np.abs(dev[both] - host[both]) / host[both]
        assert np.median(rel) < 1e-3
        # and both track the true F0
        assert abs(np.median(dev[dev > 0]) - f0) / f0 < 0.02


def test_device_matches_host_on_segmented_signal():
    wav = _segmented_signal()
    host = yin_f0(wav, SR, HOP)
    dev = yin_f0_device(wav, SR, HOP)
    agree = ((host > 0) == (dev > 0)).mean()
    assert agree > 0.95, f"voicing agreement {agree:.3f}"
    both = (host > 0) & (dev > 0)
    rel = np.abs(dev[both] - host[both]) / host[both]
    assert np.median(rel) < 1e-3
    assert np.quantile(rel, 0.95) < 0.02


def test_silence_and_noise_unvoiced():
    wav = np.zeros(SR, np.float32)
    assert (yin_f0_device(wav) == 0).all()
    rng = np.random.default_rng(0)
    noise = (0.1 * rng.standard_normal(SR)).astype(np.float32)
    f0 = yin_f0_device(noise)
    assert (f0 > 0).mean() < 0.2


def test_batched_rows_match_single_runs_and_padding_is_unvoiced():
    import jax.numpy as jnp

    wavs = [_tone(150.0, 0.6, seed=3), _segmented_signal(seed=4),
            _tone(300.0, 0.3, seed=5)]
    T = max(len(w) for w in wavs) + 777   # deliberately ragged bucket
    batch = np.zeros((len(wavs), T), np.float32)
    lengths = np.array([len(w) for w in wavs])
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    out = np.asarray(yin_f0_batched(jnp.asarray(batch),
                                    jnp.asarray(lengths), SR, HOP))
    assert out.shape == (len(wavs), 1 + T // HOP)
    for i, w in enumerate(wavs):
        nf = 1 + len(w) // HOP
        single = yin_f0_device(w, SR, HOP)
        np.testing.assert_allclose(out[i, :nf], single[:nf],
                                   rtol=1e-4, atol=1e-2)
        assert (out[i, nf:] == 0).all(), "padding frames must be unvoiced"


def test_cli_pitch_method_override(tmp_path):
    """`preprocess --pitch_method yin_device` routes the stored pitch
    through the device tracker (overriding the YAML/world default)."""
    import os

    from fscl_tpu.cli.__main__ import main
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.dsp.audio_io import save_wav

    corpus = tmp_path / "LJSpeech"
    (corpus / "wavs").mkdir(parents=True)
    tg_dir = tmp_path / "tg"
    tg_dir.mkdir()
    t = np.arange(int(SR * 1.2)) / SR
    wav = (0.4 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    save_wav(str(corpus / "wavs" / "LJ001-0000.wav"), wav, SR)
    (corpus / "metadata.csv").write_text("LJ001-0000|x|x\n")
    from fscl_tpu.data.scripts import synthetic_textgrid
    (tg_dir / "LJ001-0000.TextGrid").write_text(
        synthetic_textgrid(["HH", "AY1"], 0.5))

    out = tmp_path / "features"
    rc = main(["preprocess", str(corpus), str(out), "--parser", "LJSpeech",
               "--parse_raw", "--preprocess", "--textgrid_dir", str(tg_dir),
               "--n_workers", "1", "--pitch_method", "yin_device"])
    assert not rc          # run() returns None/0 on success
    store = FeatureStore(str(out))
    q = {"spk": "LJSpeech", "basename": "LJ001-0000"}
    pitch = store.pitch.read_from_query(q)
    trimmed = store.wav_trim_22050.read_from_query(q)
    ref = yin_f0_device(trimmed, SR, HOP)[: len(pitch)]
    np.testing.assert_allclose(pitch, ref, rtol=1e-4, atol=1e-2)
    assert (pitch > 0).any()


def test_preprocess_batched_with_device_pitch(tmp_path):
    """pitch_method='yin_device' through the batched preprocessing path:
    stored pitch features follow the device tracker, everything else
    matches the host path."""
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.scripts import make_synthetic_corpus

    root = tmp_path / "corpus"
    make_synthetic_corpus(str(root), n_utts=3, seed=0)
    store = FeatureStore(str(root / "features"))
    queries = [{"spk": "spk0", "basename": f"u{i}"} for i in range(3)]

    from fscl_tpu.dsp.preprocess import preprocess_utterances_batched
    items = [(q, str(root / (q["basename"] + ".TextGrid")))
             for q in queries]
    samples, ok = preprocess_utterances_batched(
        store, items, pitch_method="yin_device")
    assert len(ok) == len(queries)
    for q in queries:
        pitch = store.pitch.read_from_query(q)
        wav = store.wav_trim_22050.read_from_query(q)
        ref = yin_f0_device(wav, SR, HOP)[: len(pitch)]
        np.testing.assert_allclose(pitch, ref, rtol=1e-4, atol=1e-2)
