"""T2U2S / DA datamodules over a synthetic unit-labeled corpus."""
import os

import numpy as np
import pytest

from fscl_tpu.core.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
from fscl_tpu.frontend import register_unit_symbols
from fscl_tpu.frontend.symbols import common_symbols


@pytest.fixture(scope="module")
def unit_corpus(tmp_path_factory):
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    root = tmp_path_factory.mktemp("unitcorpus")
    register_unit_symbols("mixtest-units", 16)
    store = FeatureStore(str(root / "features"))
    us = store.get_ssl_unit_store("mixtest-units")
    rng = np.random.default_rng(0)
    queries = []
    n_common = len(common_symbols)
    for i in range(6):
        q = {"spk": "s0", "basename": f"u{i}"}
        n_units = int(rng.integers(3, 7))
        unit_ids = rng.integers(0, 16, n_units)
        us.phoneme.save(" ".join(str(u) for u in unit_ids), q)
        dur = rng.integers(2, 5, n_units).astype(np.int64)
        us.duration.save(dur, q)
        us.duration_avg_pitch.save(rng.normal(size=n_units).astype(np.float32), q)
        us.duration_avg_energy.save(rng.normal(size=n_units).astype(np.float32), q)
        store.mel.save(rng.normal(size=(int(dur.sum()), 80)).astype(np.float32), q)
        store.phoneme.save("HH AY1 K", q)
        store.text.save("hi", q)
        queries.append(q)
    store.save_speakers(["s0"])
    store.flush()
    us.flush()
    split = str(root / "train.txt")
    write_queries_to_txt(store, queries, split)
    dc = DataConfig(
        name="mixtest", lang_id=0, symbol_id="en",
        data_dir=store.root,
        subsets=(("train", split),),
        text_cleaners=("basic_cleaners",),
        unit_name="mixtest-units")
    return store, dc


def test_t2u2s_datamodule(unit_corpus):
    from fscl_tpu.data.mix_datamodules import T2U2SDataModule
    store, dc = unit_corpus
    dm = T2U2SDataModule([dc], ModelConfig(),
                         TrainConfig(optim=OptimConfig(batch_size=2)))
    dm.setup()
    batch = next(dm.train_batches())
    assert batch.t2u.units.shape[0] == 2
    assert batch.u2s.mels.shape[0] == 2
    # u2s texts = unit ids (without eos), durations align with mel frames
    assert batch.u2s.durations.sum(1).max() <= batch.u2s.mels.shape[1]


def test_t2u_episodic_datamodule(unit_corpus, tmp_path):
    import numpy as np
    from fscl_tpu.data.mix_datamodules import T2UEpisodicDataModule
    store, dc = unit_corpus
    # FSCLDataset needs acoustic + SSL inputs for the support set
    rng = np.random.default_rng(1)
    for q in [{"spk": "s0", "basename": f"u{i}"} for i in range(6)]:
        n_ph = 3
        dur = np.array([4, 3, 5], np.int64)
        store.mfa_duration.save(dur, q)
        store.mfa_duration_avg_pitch.save(
            rng.normal(size=n_ph).astype(np.float32), q)
        store.mfa_duration_avg_energy.save(
            rng.normal(size=n_ph).astype(np.float32), q)
        total = int(dur.sum())
        store.mel.save(rng.normal(size=(total, 80)).astype(np.float32), q)
        store.wav_trim_16000.save(
            rng.normal(size=8000).astype(np.float32), q)
        store.mfa_segment.save(
            [[0.0, 0.1], [0.1, 0.2], [0.2, 0.3]], q)
    store.flush()
    dm = T2UEpisodicDataModule(
        [dc], ModelConfig(), TrainConfig(optim=OptimConfig(batch_size=1)),
        shots=3, queries=2, upstream="tiny")
    dm.setup()
    episode = next(dm.train_batches())
    assert episode.sup.wavs.shape[0] == 3
    assert episode.qry.units.shape[0] == 2


def test_da_datamodule(unit_corpus):
    from fscl_tpu.data.mix_datamodules import T2UDADataModule
    store, dc = unit_corpus
    dm = T2UDADataModule([dc], ModelConfig(),
                         TrainConfig(optim=OptimConfig(batch_size=2)))
    dm.setup()
    batch = next(dm.train_batches())
    assert batch.t2u.units.shape == batch.real_units.shape
