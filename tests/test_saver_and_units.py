"""SynthSaver artifacts + UnitFSCLDataset reading pseudo-unit labels."""
import os

import numpy as np
import pytest


def test_synth_saver_writes_artifacts(tmp_path):
    from fscl_tpu.obs.synth_saver import SynthSaver
    saver = SynthSaver(str(tmp_path), system=None, synth_step=1)
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(40, 80)).astype(np.float32)
    pitch = rng.normal(size=40).astype(np.float32)
    saver.save_sample(100, "recon", mel, pitch=pitch, write_audio=True)
    assert os.path.isfile(tmp_path / "step100-recon.png")
    assert os.path.isfile(tmp_path / "step100-recon.wav")
    from scipy.io import wavfile
    sr, wav = wavfile.read(tmp_path / "step100-recon.wav")
    assert sr == 22050 and len(wav) > 0


def test_unit_fscl_dataset(tmp_path):
    from fscl_tpu.core.config import DataConfig, ModelConfig
    from fscl_tpu.data.datasets import UnitFSCLDataset
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    from fscl_tpu.frontend import register_unit_symbols, n_symbols

    register_unit_symbols("test-units-8", 8)
    store = FeatureStore(str(tmp_path / "corpus"))
    rng = np.random.default_rng(0)
    q = {"spk": "s0", "basename": "u0"}
    L_ph = 4
    dur = np.array([3, 2, 4, 1], np.int64)
    total = int(dur.sum())
    store.mel.save(rng.normal(size=(total, 80)).astype(np.float32), q)
    store.mfa_duration.save(dur, q)
    store.mfa_duration_avg_pitch.save(
        rng.normal(size=L_ph).astype(np.float32), q)
    store.mfa_duration_avg_energy.save(
        rng.normal(size=L_ph).astype(np.float32), q)
    store.phoneme.save("HH AY1 K S", q)
    store.text.save("hi", q)
    store.wav_trim_16000.save(rng.normal(size=8000).astype(np.float32), q)
    store.mfa_segment.save([[0.0, 0.05], [0.05, 0.1], [0.1, 0.2], [0.2, 0.22]], q)
    us = store.get_ssl_unit_store("test-units-8")
    us.phoneme.save("1 4 2", q)
    us.duration.save(np.array([5, 10, 10], np.int64), q)
    store.save_speakers(["s0"])
    store.flush()
    us.flush()
    split = str(tmp_path / "train.txt")
    write_queries_to_txt(store, [q], split)

    dc = DataConfig(name="t", lang_id=0, symbol_id="en",
                    text_cleaners=("basic_cleaners",))
    ds = UnitFSCLDataset(split, store, dc, ModelConfig(),
                         unit_name="test-units-8")
    sample = ds[0]
    assert sample["symbol_id"] == "test-units-8"
    assert len(sample["phonemes"]) == 3        # unit labels, not MFA phones
    assert len(sample["avg_frames"]) == 3
    assert sample["n_symbols"] == n_symbols("test-units-8")


def test_adaptation_saver(tmp_path):
    import csv

    import numpy as np

    from fscl_tpu.obs.loggers import AdaptationSaver

    saver = AdaptationSaver(str(tmp_path))
    losses = np.array([[3.0, 2.0, 1.5], [4.0, 3.5, 3.0]], np.float32)
    paths = saver.save_many(["tid-0", "tid-1"], losses)
    assert len(paths) == 2
    with open(paths[1]) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["ft_step", "Total Loss"]
    assert [r[0] for r in rows[1:]] == ["0", "1", "2"]
    assert abs(float(rows[1][1]) - 4.0) < 1e-6
