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
