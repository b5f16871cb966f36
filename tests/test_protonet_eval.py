"""End-to-end protonet evaluation: task dirs -> prototypes -> transcription
jsons -> PER/FER."""
import glob
import json
import os

import numpy as np
import pytest

from fscl_tpu.core.config import (
    DataConfig, ModelConfig, OptimConfig, TransformerConfig, UpstreamConfig,
)


def test_protonet_eval_end_to_end(tmp_path):
    import jax
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    from fscl_tpu.eval.metrics import fer_over_infos, per_over_infos
    from fscl_tpu.eval.protonet_eval import run_protonet_eval
    from fscl_tpu.eval.task_generation import TaskGenerator
    from fscl_tpu.models.hubert import SSLUpstream
    from fscl_tpu.systems.pr import SSLProtoNetSystem, PREpisode, PRBatch

    rng = np.random.default_rng(0)
    store = FeatureStore(str(tmp_path / "features"))
    phones = ["HH", "AY1", "K"]
    queries = []
    for i in range(12):
        q = {"spk": "s0", "basename": f"u{i}"}
        n = int(rng.integers(2, 4))
        phns = [phones[int(j)] for j in rng.integers(0, len(phones), n)]
        store.phoneme.save(" ".join(phns), q)
        store.text.save("x", q)
        store.wav_trim_16000.save(
            rng.normal(size=6400).astype(np.float32), q)
        seg = [[0.1 * k, 0.1 * (k + 1)] for k in range(n)]
        store.mfa_segment.save(seg, q)
        queries.append(q)
    store.save_metadata(queries)
    store.save_speakers(["s0"])
    store.flush()
    src = str(tmp_path / "val.txt")
    write_queries_to_txt(store, queries, src)

    gen = TaskGenerator("mini", store, lang_id=0, symbol_id="en", seed=1)
    gen.generate(src, str(tmp_path / "fs"), shots=[4], n_qry=2, n_tasks=2)

    cfg = ModelConfig(
        transformer=TransformerConfig(encoder_hidden=16, encoder_head=2),
        upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2))
    system = SSLProtoNetSystem(
        cfg, OptimConfig(), (("en", 361),),
        upstream=SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32))
    # init via a dummy episode
    dummy = PRBatch(
        wavs=np.zeros((2, 6400), np.float32),
        wav_lens=np.full((2,), 6400, np.int32),
        avg_frames=np.full((2, 3), 5, np.int32),
        phonemes=np.ones((2, 3), np.int32),
        lang_ids=np.zeros(2, np.int32), n_symbols=361, symbol_id="en")
    state = system.init_state(jax.random.PRNGKey(0),
                              PREpisode(sup=dummy, qry=dummy))

    out_dir = str(tmp_path / "out")
    paths = run_protonet_eval(
        system, state.params, str(tmp_path / "fs" / "4-shot"), out_dir,
        use_dpdp=False)
    assert len(paths) == 2
    for p in paths:
        with open(p) as f:
            infos = json.load(f)
        assert len(infos) == 2
        for info in infos:
            assert info["gt"] and "pred" in info
        per = per_over_infos(infos)
        fer = fer_over_infos(infos)
        assert 0.0 <= per and 0.0 <= fer <= 1.0


def test_trans_head_eval_end_to_end(tmp_path):
    """TransHead task evaluation: generated head from the support split,
    batched query transcription, PER/FER-consumable jsons."""
    import dataclasses

    import jax
    from fscl_tpu.core.config import CodebookConfig
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    from fscl_tpu.eval.metrics import fer_over_infos, per_over_infos
    from fscl_tpu.eval.protonet_eval import run_trans_head_eval
    from fscl_tpu.eval.task_generation import TaskGenerator
    from fscl_tpu.models.hubert import SSLUpstream
    from fscl_tpu.systems.pr import PRBatch, PREpisode, TransHeadPRSystem

    rng = np.random.default_rng(3)
    store = FeatureStore(str(tmp_path / "features"))
    phones = ["HH", "AY1", "K"]
    queries = []
    for i in range(12):
        q = {"spk": "s0", "basename": f"u{i}"}
        n = int(rng.integers(2, 4))
        phns = [phones[int(j)] for j in rng.integers(0, len(phones), n)]
        store.phoneme.save(" ".join(phns), q)
        store.text.save("x", q)
        store.wav_trim_16000.save(
            rng.normal(size=6400).astype(np.float32), q)
        store.mfa_segment.save(
            [[0.1 * k, 0.1 * (k + 1)] for k in range(n)], q)
        queries.append(q)
    store.save_metadata(queries)
    store.save_speakers(["s0"])
    store.flush()
    src = str(tmp_path / "val.txt")
    write_queries_to_txt(store, queries, src)

    gen = TaskGenerator("mini", store, lang_id=0, symbol_id="en", seed=2)
    gen.generate(src, str(tmp_path / "fs"), shots=[4], n_qry=2, n_tasks=1)

    cfg = ModelConfig(
        transformer=TransformerConfig(encoder_hidden=16, encoder_head=2),
        codebook=CodebookConfig(size=4, num_heads=2, dim=16),
        upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2))
    system = TransHeadPRSystem(
        cfg, OptimConfig(), (("en", 361),),
        upstream=SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32))
    dummy = PRBatch(
        wavs=np.zeros((2, 6400), np.float32),
        wav_lens=np.full((2,), 6400, np.int32),
        avg_frames=np.full((2, 3), 5, np.int32),
        phonemes=np.ones((2, 3), np.int32),
        lang_ids=np.zeros(2, np.int32), n_symbols=361, symbol_id="en")
    state = system.init_state(jax.random.PRNGKey(0),
                              PREpisode(sup=dummy, qry=dummy))

    out_dir = str(tmp_path / "out")
    paths = run_trans_head_eval(
        system, state.params, str(tmp_path / "fs" / "4-shot"), out_dir,
        use_dpdp=False)
    assert len(paths) == 1
    with open(paths[0]) as f:
        infos = json.load(f)
    assert len(infos) == 2
    for info in infos:
        assert info["gt"] and "pred" in info
    assert 0.0 <= per_over_infos(infos)
    assert 0.0 <= fer_over_infos(infos) <= 1.0
