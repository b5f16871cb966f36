"""DSP tests: STFT/mel golden checks, pitch on synthetic tones, TextGrid,
full preprocessing of a synthetic utterance."""
import json
import os

import numpy as np
import pytest

from fscl_tpu.core.config import AudioConfig
from fscl_tpu.dsp.pitch import interpolate_f0, yin_f0


def test_stft_matches_scipy():
    import jax.numpy as jnp
    from scipy.signal import stft as scipy_stft

    from fscl_tpu.ops.stft import stft_magnitude

    rng = np.random.default_rng(0)
    wav = rng.normal(size=4096).astype(np.float32)
    mag = np.asarray(stft_magnitude(jnp.asarray(wav), 1024, 256, 1024))
    # scipy: hann window, no detrend, onesided; align scaling
    f, t, Z = scipy_stft(wav, nperseg=1024, noverlap=1024 - 256,
                         boundary="even", padded=False, window="hann")
    # scipy scales by win.sum(); our stft is unscaled
    scipy_mag = np.abs(Z).T * np.hanning(1024).sum() / 2 * 2
    n = min(len(mag), len(scipy_mag))
    # compare shapes and strong correlation (window/pad conventions differ
    # slightly at edges)
    assert mag.shape[1] == 513
    interior = slice(2, n - 2)
    c = np.corrcoef(mag[interior].ravel(), scipy_mag[interior].ravel())[0, 1]
    assert c > 0.99


def test_mel_sine_peak_bin():
    import jax.numpy as jnp

    from fscl_tpu.ops.stft import mel_filterbank, mel_spectrogram

    sr = 22050
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mel, energy = mel_spectrogram(jnp.asarray(wav), sr=sr)
    mel = np.asarray(mel)
    assert mel.shape[1] == 80
    assert (np.asarray(energy) >= 0).all()
    # peak mel bin should correspond to ~1000 Hz
    fb = mel_filterbank(sr, 1024, 80, 0.0, 8000.0)
    freqs = np.linspace(0, sr / 2, 513)
    peak_bin = int(np.argmax(mel.mean(axis=0)))
    center = freqs[np.argmax(fb[peak_bin])]
    assert 800 < center < 1250, center


def test_yin_f0_sine():
    sr = 22050
    t = np.arange(int(sr * 0.6)) / sr
    for f in (110.0, 220.0, 440.0):
        wav = np.sin(2 * np.pi * f * t).astype(np.float32)
        f0 = yin_f0(wav, sr=sr)
        voiced = f0[f0 > 0]
        assert len(voiced) > len(f0) * 0.5
        med = np.median(voiced)
        assert abs(med - f) / f < 0.03, (f, med)


def test_yin_f0_silence_unvoiced():
    f0 = yin_f0(np.zeros(22050, np.float32))
    assert (f0 == 0).all()


def test_interpolate_f0():
    f0 = np.array([0, 100, 0, 0, 200, 0], np.float32)
    interp, voiced = interpolate_f0(f0)
    assert voiced.sum() == 2
    np.testing.assert_allclose(interp[2:4], [100 + 100 / 3, 100 + 200 / 3],
                               rtol=1e-5)
    assert interp[0] == 100 and interp[-1] == 200


TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "hi"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.1
            text = ""
        intervals [2]:
            xmin = 0.1
            xmax = 0.5
            text = "HH"
        intervals [3]:
            xmin = 0.5
            xmax = 0.9
            text = "AY1"
        intervals [4]:
            xmin = 0.9
            xmax = 1.0
            text = ""
"""


def test_textgrid_parse(tmp_path):
    from fscl_tpu.dsp.textgrid import textgrid_to_segments_and_phonemes
    p = tmp_path / "u.TextGrid"
    p.write_text(TEXTGRID)
    segments, phonemes = textgrid_to_segments_and_phonemes(str(p))
    assert phonemes == ["HH", "AY1"]   # silences trimmed
    assert segments[0] == (0.1, 0.5)


def test_preprocess_utterance_end_to_end(tmp_path):
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.dsp.preprocess import (
        compute_stats, prepare_initial_features, preprocess_utterance,
    )

    sr = 22050
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    wav_path = str(tmp_path / "u1.wav")
    save_wav(wav_path, wav, sr)
    tg_path = str(tmp_path / "u1.TextGrid")
    with open(tg_path, "w") as f:
        f.write(TEXTGRID)

    store = FeatureStore(str(tmp_path / "corpus"))
    query = {"spk": "spk0", "basename": "u1"}
    prepare_initial_features(store, query, wav_path, "hi")
    stats_sample = preprocess_utterance(store, query, tg_path)
    assert stats_sample is not None
    stats = compute_stats([stats_sample], store)
    assert stats["pitch"][0] > 0

    mel = store.mel.read_from_query(query)
    dur = store.mfa_duration.read_from_query(query)
    pitch = store.mfa_duration_avg_pitch.read_from_query(query)
    phonemes = store.phoneme.read_from_query(query)
    assert mel.shape[1] == 80
    assert len(dur) == len(phonemes.split()) == len(pitch) == 2
    assert int(dur.sum()) <= len(mel)
    # pitch of a 220 Hz tone
    assert abs(pitch[0] - 220) < 20
    slices = store.spk_ref_mel_slices.read_from_query(query)
    assert slices.ndim == 3 and slices.shape[1:] == (160, 40)
    store.flush()
    # dataset can read it back
    from fscl_tpu.core.config import DataConfig, ModelConfig
    from fscl_tpu.data.feature_store import write_queries_to_txt
    store.save_speakers(["spk0"])
    write_queries_to_txt(store, [query], str(tmp_path / "train.txt"))
    from fscl_tpu.data.datasets import FSCLDataset
    ds = FSCLDataset(
        str(tmp_path / "train.txt"), store,
        DataConfig(name="test", lang_id=0, symbol_id="en",
                   text_cleaners=("basic_cleaners",)),
        ModelConfig())
    sample = ds[0]
    assert sample["phonemes"].shape[0] == 2
    assert sample["mel"].shape[0] == int(dur.sum())
    assert sample["raw_feat"].ndim == 1
    assert len(sample["avg_frames"]) == 2


def test_batched_preprocess_matches_per_utterance(tmp_path):
    """preprocess_utterances_batched groups device calls by wav bucket;
    every stored feature must match the per-utterance path exactly (same
    ops with a leading batch axis, zero padding identical)."""
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.dsp.preprocess import (
        prepare_initial_features, preprocess_utterance,
        preprocess_utterances_batched,
    )

    sr = 22050
    rng = np.random.default_rng(7)
    stores = [FeatureStore(str(tmp_path / name)) for name in ("a", "b")]
    queries, tgs = [], []
    # three different lengths: two land in the same bucket, one in another
    for i, dur_s in enumerate((1.0, 1.3, 3.1)):
        n = int(sr * dur_s)
        t = np.arange(n) / sr
        wav = (0.4 * np.sin(2 * np.pi * (180 + 40 * i) * t)
               + 0.05 * rng.standard_normal(n)).astype(np.float32)
        wav_path = str(tmp_path / f"u{i}.wav")
        save_wav(wav_path, wav, sr)
        tg_path = str(tmp_path / f"u{i}.TextGrid")
        with open(tg_path, "w") as f:
            f.write(TEXTGRID)
        q = {"spk": "spk0", "basename": f"u{i}"}
        queries.append(q)
        tgs.append(tg_path)
        for store in stores:
            prepare_initial_features(store, q, wav_path, f"text {i}")

    ref_samples = []
    for q, tg in zip(queries, tgs):
        s = preprocess_utterance(stores[0], q, tg)
        assert s is not None
        ref_samples.append(s)

    # chunk_size=2 also exercises the bounded-memory chunking path
    got_samples, ok = preprocess_utterances_batched(
        stores[1], list(zip(queries, tgs)), device_batch=2, chunk_size=2)
    assert ok == queries
    assert len(got_samples) == len(ref_samples)

    for q in queries:
        for feat in ("mel", "energy", "pitch", "interpolate_pitch",
                     "mfa_duration", "mfa_duration_avg_pitch",
                     "mfa_duration_avg_energy", "spk_ref_mel_slices"):
            a = getattr(stores[0], feat).read_from_query(q)
            b = getattr(stores[1], feat).read_from_query(q)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-5,
                err_msg=f"{feat} diverges for {q}")
        assert (stores[0].phoneme.read_from_query(q)
                == stores[1].phoneme.read_from_query(q))
    for sa, sb in zip(ref_samples, got_samples):
        np.testing.assert_allclose(sa["pitch"], sb["pitch"], atol=1e-5)
        np.testing.assert_allclose(sa["energy"], sb["energy"], atol=1e-5)


def test_batched_preprocess_isolates_failures(tmp_path):
    """A corrupt TextGrid (or missing wav) fails only its own utterance:
    the rest of the chunk proceeds and on_error receives the failure."""
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.dsp.preprocess import (
        prepare_initial_features, preprocess_utterances_batched,
    )

    sr = 22050
    store = FeatureStore(str(tmp_path / "s"))
    items, queries = [], []
    for i in range(3):
        n = int(sr * 1.2)
        wav = (0.4 * np.sin(2 * np.pi * 200 * np.arange(n) / sr)
               ).astype(np.float32)
        wav_path = str(tmp_path / f"u{i}.wav")
        save_wav(wav_path, wav, sr)
        tg_path = str(tmp_path / f"u{i}.TextGrid")
        with open(tg_path, "w") as f:
            f.write("garbage, not a TextGrid" if i == 1 else TEXTGRID)
        q = {"spk": "spk0", "basename": f"u{i}"}
        prepare_initial_features(store, q, wav_path, f"text {i}")
        queries.append(q)
        items.append((q, tg_path))

    failures = []
    samples, ok = preprocess_utterances_batched(
        store, items, on_error=lambda q, e: failures.append(q))
    assert ok == [queries[0], queries[2]]
    assert len(samples) == 2
    # garbage TextGrid either raises (reported) or parses to no segments
    # (silently skipped) — it must not appear in ok either way
    assert queries[1] not in ok
