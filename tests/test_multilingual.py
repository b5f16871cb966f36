"""Multilingual joint training: two symbol sets, re-id into concat space,
shared model with language embeddings (driver config 4 flavor)."""
import os

import numpy as np
import pytest

from fscl_tpu.core.config import (
    DataConfig, ModelConfig, OptimConfig, SpeakerConfig, TrainConfig,
    TransformerConfig,
)
from fscl_tpu.frontend import register_symbols


@pytest.fixture(scope="module")
def two_lang_corpora(tmp_path_factory):
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    register_symbols("xx-test", ["_", "-", "@XA", "@XB", "@XC"])
    root = tmp_path_factory.mktemp("ml")
    rng = np.random.default_rng(0)
    configs = []
    for lang_id, (name, symbol_id, phones) in enumerate([
            ("en-mini", "en", ["HH", "AY1", "K"]),
            ("xx-mini", "xx-test", ["XA", "XB", "XC"])]):
        store = FeatureStore(str(root / name))
        queries = []
        for i in range(4):
            q = {"spk": f"{name}-spk", "basename": f"u{i}"}
            n = int(rng.integers(2, 4))
            phns = [phones[int(j)] for j in rng.integers(0, len(phones), n)]
            dur = rng.integers(2, 4, n).astype(np.int64)
            store.phoneme.save(" ".join(phns), q)
            store.text.save("x", q)
            store.mel.save(
                rng.normal(size=(int(dur.sum()), 80)).astype(np.float32), q)
            store.mfa_duration.save(dur, q)
            store.mfa_duration_avg_pitch.save(
                rng.normal(size=n).astype(np.float32), q)
            store.mfa_duration_avg_energy.save(
                rng.normal(size=n).astype(np.float32), q)
            queries.append(q)
        store.save_speakers([f"{name}-spk"])
        store.flush()
        split = str(root / name / "train.txt")
        write_queries_to_txt(store, queries, split)
        configs.append(DataConfig(
            name=name, lang_id=lang_id, symbol_id=symbol_id,
            data_dir=store.root, subsets=(("train", split),),
            text_cleaners=("basic_cleaners",)))
    return configs


def test_multilingual_joint_training(two_lang_corpora):
    import jax
    from fscl_tpu.data.datamodules import (
        FastSpeech2DataModule, build_id2symbols, symbol_offsets,
    )
    from fscl_tpu.systems.baseline import BaselineSystem

    configs = two_lang_corpora
    model_cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32, encoder_head=2,
            decoder_head=2),
        max_seq_len=32, speaker=SpeakerConfig(n_speakers=2))
    train_cfg = TrainConfig(optim=OptimConfig(batch_size=4))
    dm = FastSpeech2DataModule(configs, model_cfg, train_cfg)
    dm.setup()

    id2symbols = build_id2symbols(configs)
    offsets = symbol_offsets(id2symbols)
    n_en = dict(id2symbols)["en"]
    assert offsets["xx-test"] == n_en

    # xx samples are re-id'd past the en table
    xx_ds = dm.train_set.datasets[1]
    sample = xx_ds[0]
    assert (sample["phonemes"] >= n_en).all()
    assert sample["speaker"] == 1            # global speaker index

    system = BaselineSystem(model_cfg, train_cfg.optim, id2symbols)
    batches = dm.train_batches()
    example = next(batches)
    state = system.init_state(jax.random.PRNGKey(0), example)
    step = jax.jit(system.train_step)
    for i in range(2):
        state, metrics = step(state, next(batches), jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["Total Loss"]))
    # both language tables get gradients across the epoch stream
    moved = {
        sid: not np.allclose(
            np.asarray(state.params["embedding"][f"table-{sid}"]),
            0.0)
        for sid, _ in id2symbols}
    assert all(moved.values())
