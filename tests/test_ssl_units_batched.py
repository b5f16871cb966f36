"""Batched SSL feature extraction for unit discovery
(data/ssl_units.py:batched_ssl_extractor) + the make-units CLI hubert path.

The old per-utterance path ran the upstream eagerly with a different input
length per utterance (one recompile each) and collapsed the
(T', n_layers+1, D) hidden tensor over the wrong axis; these tests pin the
new semantics: per-query features are (ssl_num_frames(len), dim) slices of
one chosen layer, invariant to which wav-length bucket/batch row a query
landed in.
"""
import numpy as np
import pytest

from fscl_tpu.core.config import UpstreamConfig
from fscl_tpu.data.feature_store import FeatureStore
from fscl_tpu.models.hubert import ssl_num_frames


def _mini_store(tmp_path, lens, sr=16000):
    store = FeatureStore(str(tmp_path / "feat"))
    rng = np.random.default_rng(0)
    queries = []
    for i, n in enumerate(lens):
        q = {"spk": "s", "basename": f"u{i}"}
        w = (0.1 * rng.standard_normal(n)).astype(np.float32)
        store.wav_trim_16000.save(w, q)
        queries.append(q)
    return store, queries


# tiny 2-layer 64d upstream keeps the CPU tests fast; make_upstream uses
# cfg dims for unknown names
TINY_CFG = UpstreamConfig(name="tiny", dim=64, n_layers=3)


def test_batched_extractor_shapes_and_bucket_invariance(tmp_path):
    from fscl_tpu.data.ssl_units import batched_ssl_extractor

    lens = [16000 * 2 - 123, 16000 * 2, 16000 * 4 - 5000]  # two buckets
    store, queries = _mini_store(tmp_path, lens)
    extract = batched_ssl_extractor(store, queries, source="tiny",
                                    cfg=TINY_CFG, device_batch=2)
    feats = [extract(q) for q in queries]
    for f, n in zip(feats, lens):
        assert f.shape[0] == ssl_num_frames(n)
        assert np.isfinite(f).all()

    # bucket/batch-row invariance: re-run with device_batch=1 (different
    # batching) — per-query features must match (padding is masked out of
    # the transformer, so the row content is bucket-independent)
    extract1 = batched_ssl_extractor(store, queries, source="tiny",
                                     cfg=TINY_CFG, device_batch=1)
    for q, f in zip(queries, feats):
        np.testing.assert_allclose(extract1(q), f, rtol=2e-4, atol=2e-4)


def test_make_units_cli_hubert_source(tmp_path):
    """make-units --source <ssl> end-to-end: unit store populated with
    plausible segmentations over real frame counts."""
    from fscl_tpu.cli.__main__ import main

    name = "hubert"     # 768d/12-layer base shapes via the CLI
    lens = [16000 * 2 - 123, 16000 * 2 - 777]
    store, queries = _mini_store(tmp_path, lens)
    # make-units loads metadata
    store.save_metadata(queries)
    store.flush()

    rc = main(["make-units", str(tmp_path / "feat"), "--unit_name", "km4",
               "--n_units", "4", "--source", name])
    assert not rc
    unit_store = store.get_ssl_unit_store("km4")
    for q, n in zip(queries, lens):
        dur = np.asarray(unit_store.duration.read_from_query(q))
        assert dur.sum() == ssl_num_frames(n)   # segmentation covers T'
        labels = unit_store.phoneme.read_from_query(q).split()
        assert len(labels) == len(dur)
        assert all(0 <= int(u) < 4 for u in labels)
