"""Full pseudo-unit pipeline: SSL features -> k-means unit discovery ->
DPDP segmentation -> ssl_units store -> UnitDataset -> T2U training step.
(The reference's unit workflow spans evaluation/ + scripts + t2u systems.)"""
import numpy as np
import pytest

from fscl_tpu.core.config import DataConfig, ModelConfig, OptimConfig
from fscl_tpu.models.tacotron2_t2u import T2UConfig


def test_unit_discovery_to_t2u_training(tmp_path):
    import jax
    from fscl_tpu.data.datasets import UnitDataset
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    from fscl_tpu.data.ssl_units import generate_ssl_units, kmeans_unit_labeler
    from fscl_tpu.frontend import register_unit_symbols
    from fscl_tpu.models.hubert import SSLUpstream

    rng = np.random.default_rng(0)
    store = FeatureStore(str(tmp_path / "features"))
    queries = []
    for i in range(4):
        q = {"spk": "s0", "basename": f"u{i}"}
        wav = rng.normal(size=8000).astype(np.float32)
        store.wav_trim_16000.save(wav, q)
        store.phoneme.save("HH AY1", q)
        store.text.save("hi", q)
        store.interpolate_pitch.save(
            rng.normal(size=100).astype(np.float32), q)
        store.energy.save(rng.normal(size=100).astype(np.float32), q)
        queries.append(q)
    store.save_metadata(queries)
    store.save_speakers(["s0"])
    store.flush()

    # SSL features from a tiny upstream
    upstream = SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32)
    variables = upstream.init(jax.random.PRNGKey(0), np.zeros((1, 8000), np.float32))

    def extract(q):
        wav = store.wav_trim_16000.read_from_query(q)[None]
        hidden, _ = upstream.apply(variables, wav)
        return np.asarray(hidden[0, :, -1])   # last layer

    n_units = 6
    labeler = kmeans_unit_labeler(extract, queries, n_units=n_units,
                                  max_frames=200)
    unit_name = "km-test"
    register_unit_symbols(unit_name, n_units)
    n = generate_ssl_units(store, unit_name, labeler, fp=0.02, lam=0.5)
    assert n == 4

    us = store.get_ssl_unit_store(unit_name)
    for q in queries:
        labels = us.phoneme.read_from_query(q).split()
        assert labels and all(0 <= int(l) < n_units for l in labels)

    # UnitDataset -> supervised T2U step on the discovered units
    split = str(tmp_path / "train.txt")
    write_queries_to_txt(store, queries, split)
    from fscl_tpu.frontend import n_symbols
    dc = DataConfig(name="km", lang_id=0, symbol_id="en",
                    data_dir=store.root, subsets=(("train", split),),
                    text_cleaners=("basic_cleaners",), unit_name=unit_name)
    ds = UnitDataset(split, store, dc)
    sample = ds[0]
    assert sample["units"][-1] == UnitDataset.EOS

    from fscl_tpu.data.mix_datamodules import _collate_t2u
    from fscl_tpu.systems.t2u import TacoT2USystem
    batch = _collate_t2u([ds[0], ds[1]])
    tcfg = T2UConfig(
        n_units=n_symbols(unit_name) + 9,  # table + eos margin
        d_unit=16, symbols_embedding_dim=16, encoder_embedding_dim=32,
        prenet_dim=16, attention_rnn_dim=32, decoder_rnn_dim=32,
        attention_dim=16, attention_location_n_filters=4,
        attention_location_kernel_size=7)
    system = TacoT2USystem(ModelConfig(), OptimConfig(),
                           (("en", n_symbols("en")),), tcfg)
    state = system.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))
