"""C++ batch loader parity with the Python dataset+collate path, and the
frame-level pitch/energy collate shape contract."""
import os

import numpy as np
import pytest

from fscl_tpu.core.config import (
    DataConfig, ModelConfig, SpeakerConfig, VarianceConfig,
)
from fscl_tpu.core.stats import DEFAULT_STATS
from fscl_tpu.data.batch import collate_batch
from fscl_tpu.data.datasets import FastSpeech2Dataset
from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
from fscl_tpu.data.native_loader import NativeCollate, native_available


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("nativecorpus")
    store = FeatureStore(str(root / "features"))
    rng = np.random.default_rng(0)
    queries = []
    for i in range(6):
        q = {"spk": f"s{i % 2}", "basename": f"u{i}"}
        n_ph = int(rng.integers(3, 8))
        dur = rng.integers(2, 6, n_ph).astype(np.int64)
        total = int(dur.sum())
        store.mfa_duration.save(dur, q)
        # store one mel transposed (n_mels, T) like the reference writes it
        mel = rng.normal(size=(total, 80)).astype(np.float32)
        store.mel.save(mel.T if i == 0 else mel, q)
        store.mfa_duration_avg_pitch.save(
            rng.normal(size=n_ph).astype(np.float64) * 50 + 150, q)
        store.mfa_duration_avg_energy.save(
            np.abs(rng.normal(size=n_ph)).astype(np.float32) * 30, q)
        store.interpolate_pitch.save(
            rng.normal(size=total).astype(np.float32) * 50 + 150, q)
        store.energy.save(
            np.abs(rng.normal(size=total)).astype(np.float32) * 30, q)
        # phoneme count must equal duration count
        store.phoneme.save(" ".join(["HH"] * n_ph), q)
        store.text.save(f"utt {i}", q)
        queries.append(q)
    store.save_speakers(["s0", "s1"])
    store.flush()
    split = str(root / "train.txt")
    write_queries_to_txt(store, queries, split)
    dc = DataConfig(
        name="native", lang_id=0, symbol_id="en", data_dir=store.root,
        subsets=(("train", split),), text_cleaners=("basic_cleaners",))
    return store, dc, split, queries


@pytest.mark.skipif(not native_available(), reason="libfsclnpy unavailable")
def test_native_collate_matches_python(corpus):
    store, dc, split, queries = corpus
    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=2))
    ds = FastSpeech2Dataset(split, store, dc, cfg, DEFAULT_STATS)
    meta_py, py = collate_batch([ds[i] for i in range(4)])
    nc = NativeCollate(store, dc, cfg, DEFAULT_STATS)
    meta_nc, nat = nc.collate(queries[:4])

    assert meta_nc.ids == meta_py.ids
    assert meta_nc.raw_texts == meta_py.raw_texts
    np.testing.assert_array_equal(nat.texts, py.texts)
    np.testing.assert_array_equal(nat.src_lens, py.src_lens)
    np.testing.assert_array_equal(nat.durations, py.durations)
    np.testing.assert_array_equal(nat.mel_lens, py.mel_lens)
    np.testing.assert_array_equal(nat.speaker_args, py.speaker_args)
    np.testing.assert_array_equal(nat.lang_ids, py.lang_ids)
    np.testing.assert_allclose(nat.mels, py.mels, atol=1e-6)
    np.testing.assert_allclose(nat.pitches, py.pitches, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(nat.energies, py.energies, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not native_available(), reason="libfsclnpy unavailable")
def test_native_collate_frame_level(corpus):
    store, dc, _, queries = corpus
    cfg = ModelConfig(
        speaker=SpeakerConfig(n_speakers=2),
        variance=VarianceConfig(pitch_feature="frame_level",
                                energy_feature="frame_level"))
    nc = NativeCollate(store, dc, cfg, DEFAULT_STATS)
    _, batch = nc.collate(queries[:4])
    T = batch.mels.shape[1]
    assert batch.pitches.shape == (4, T)
    assert batch.energies.shape == (4, T)
    # frame-level targets are zero beyond each mel length
    for b in range(4):
        assert np.all(batch.pitches[b, batch.mel_lens[b]:] == 0)


def test_collate_batch_frame_level_pads_to_mel_bucket(corpus):
    """collate_batch must pad frame-level pitch/energy (mel-frame length) to
    the MEL bucket, not the text bucket (variance_adaptor.py:167 expects
    (B, T) targets)."""
    store, dc, split, _ = corpus
    cfg = ModelConfig(
        speaker=SpeakerConfig(n_speakers=2),
        variance=VarianceConfig(pitch_feature="frame_level",
                                energy_feature="frame_level"))
    ds = FastSpeech2Dataset(split, store, dc, cfg, DEFAULT_STATS)
    _, batch = collate_batch([ds[i] for i in range(4)])
    assert batch.pitches.shape[1] == batch.mels.shape[1]
    assert batch.energies.shape[1] == batch.mels.shape[1]


def test_frame_level_train_step(corpus):
    """One jitted train step on a frame-level variance config (the collate
    fix makes this shape-consistent end to end)."""
    import jax

    from fscl_tpu.core.config import OptimConfig, TransformerConfig
    from fscl_tpu.systems.baseline import BaselineSystem

    store, dc, split, _ = corpus
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32, encoder_head=2,
            decoder_head=2),
        max_seq_len=64,
        speaker=SpeakerConfig(n_speakers=2),
        variance=VarianceConfig(pitch_feature="frame_level",
                                energy_feature="frame_level"))
    ds = FastSpeech2Dataset(split, store, dc, cfg, DEFAULT_STATS)
    _, batch = collate_batch([ds[i] for i in range(4)])
    system = BaselineSystem(cfg, OptimConfig(), (("en", 361),))
    state = system.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))


@pytest.mark.skipif(not native_available(), reason="libfsclnpy unavailable")
def test_datamodule_native_path_matches_python(corpus):
    """FastSpeech2DataModule with native_io emits the same batches as the
    Python per-sample path."""
    from fscl_tpu.core.config import OptimConfig, TrainConfig
    from fscl_tpu.data.datamodules import FastSpeech2DataModule

    store, dc, split, _ = corpus
    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=2))
    tc = TrainConfig(optim=OptimConfig(batch_size=3))

    dm_nat = FastSpeech2DataModule([dc], cfg, tc, native_io=True)
    dm_py = FastSpeech2DataModule([dc], cfg, tc, native_io=False)
    dm_nat.setup()
    dm_py.setup()
    assert dm_nat._native is not None
    assert dm_py._native is None

    b_nat = next(dm_nat.train_batches())
    b_py = next(dm_py.train_batches())
    for name, a, b in zip(b_nat._fields, b_nat, b_py):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=f"field {name}")
