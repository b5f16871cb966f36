"""Tests: legacy codebooks + kmeans, samplers, ssl-unit generation, scripts,
KoG2P, profiling."""
import os

import numpy as np
import pytest


def test_kmeans_recovers_clusters():
    import jax.numpy as jnp
    from fscl_tpu.nn.phoneme_embedding import kmeans
    rng = np.random.default_rng(0)
    a = rng.normal(size=(50, 4)) + 10
    b = rng.normal(size=(50, 4)) - 10
    x = jnp.asarray(np.concatenate([a, b]))
    centroids, assign = kmeans(x, 2, iters=10)
    assign = np.asarray(assign)
    assert len(set(assign[:50])) == 1 and len(set(assign[50:])) == 1
    assert assign[0] != assign[50]


def test_hard_att_codebook():
    import jax
    import jax.numpy as jnp
    from fscl_tpu.nn.phoneme_embedding import HardAttCodebook
    mod = HardAttCodebook(codebook_size=4, dim=8, upstream_dim=6)
    q = jnp.asarray(np.random.default_rng(1).normal(size=(5, 6)))
    q = q.at[0].set(0.0)   # PAD-like zero query
    variables = mod.init(jax.random.PRNGKey(0), q)
    table, _ = mod.apply(variables, q)
    assert table.shape == (5, 8)
    np.testing.assert_array_equal(np.asarray(table[0]), 0.0)


def test_group_batch_sampler():
    from fscl_tpu.data.samplers import GroupBatchSampler
    lengths = list(np.random.default_rng(0).integers(10, 200, 100))
    sampler = GroupBatchSampler(lengths, batch_size=8)
    batches = list(sampler)
    seen = [i for b in batches for i in b]
    assert sorted(seen) == list(range(100))
    # within-batch length spread is smaller than global spread
    spreads = [max(lengths[i] for i in b) - min(lengths[i] for i in b)
               for b in batches if len(b) == 8]
    assert np.mean(spreads) < (max(lengths) - min(lengths)) / 2


def test_distributed_batch_sampler():
    from fscl_tpu.data.samplers import DistributedBatchSampler, GroupBatchSampler
    lengths = [10] * 64
    base = GroupBatchSampler(lengths, batch_size=8, seed=1)
    shards = [list(DistributedBatchSampler(base, 2, r)) for r in range(2)]
    assert len(shards[0]) + len(shards[1]) == len(list(base))


def test_generate_ssl_units(tmp_path):
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.ssl_units import generate_ssl_units
    store = FeatureStore(str(tmp_path))
    q = {"spk": "s", "basename": "u1"}
    store.save_metadata([q])
    rng = np.random.default_rng(0)
    store.interpolate_pitch.save(rng.normal(size=100).astype(np.float32), q)
    store.energy.save(rng.normal(size=100).astype(np.float32), q)

    def logits_fn(_q):
        lp = np.full((30, 5), -8.0, np.float32)
        lp[:10, 1] = 0.0
        lp[10:20, 2] = 0.0
        lp[20:, 3] = 0.0
        return lp

    n = generate_ssl_units(store, "test-unit", logits_fn)
    assert n == 1
    us = store.get_ssl_unit_store("test-unit")
    assert us.phoneme.read_from_query(q) == "1 2 3"
    assert len(us.duration.read_from_query(q)) == 3


def test_jsut_hts_to_textgrid(tmp_path):
    from fscl_tpu.data.scripts import jsut_hts_to_textgrid
    from fscl_tpu.dsp.textgrid import textgrid_to_segments_and_phonemes
    lab = tmp_path / "u.lab"
    lab.write_text(
        "0 1000000 xx^xx-sil+k=a\n"
        "1000000 3000000 xx^sil-k+a=w\n"
        "3000000 5000000 sil^k-a+w=a\n"
        "5000000 6000000 k^a-sil+xx=xx\n")
    out = tmp_path / "u.TextGrid"
    jsut_hts_to_textgrid(str(lab), str(out))
    segments, phonemes = textgrid_to_segments_and_phonemes(str(out))
    assert phonemes == ["k", "a"]


def test_merge_global_stats(tmp_path):
    import json
    from fscl_tpu.data.scripts import merge_global_stats
    s1 = {"pitch": [50, 900, 180, 40], "energy": [0, 500, 50, 40]}
    s2 = {"pitch": [60, 950, 200, 50], "energy": [0, 520, 60, 35]}
    p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
    p1.write_text(json.dumps(s1))
    p2.write_text(json.dumps(s2))
    merged = merge_global_stats([str(p1), str(p2)])
    assert merged.pitch.min == 50 and merged.pitch.max == 950
    assert 180 <= merged.pitch.mean <= 200


def test_kog2p():
    from fscl_tpu.frontend.kog2p import g2p_ko, g2p_ko_string
    assert g2p_ko_string("한국") == "h0 aa nf k0 uu kf"
    assert g2p_ko_string("음악") == "xx mm aa kf"        # liaison
    assert g2p_ko_string("국물") == "k0 uu ng mm uu ll"  # nasalization
    assert g2p_ko_string("좋다") == "c0 oo th aa"        # aspiration
    assert g2p_ko("abc") == []                            # non-hangul ignored


def test_phase_timer():
    from fscl_tpu.obs.profiling import PhaseTimer
    timer = PhaseTimer()
    with timer.phase("work"):
        sum(range(1000))
    report = timer.report()
    assert "work" in report


def test_collate_variance_level_explicit_not_inferred():
    """ADVICE r2: a frame-level batch where every sample's frame count
    equals its phoneme count (all durations == 1) must still pad
    pitch/energy to the MEL bucket when the config says frame_level —
    length inference alone cannot distinguish this case."""
    from fscl_tpu.data.batch import collate_batch

    rng = np.random.default_rng(0)
    samples = []
    for i in range(2):
        L = 5  # durations all 1 -> T == L
        samples.append(dict(
            id=f"u{i}", phonemes=rng.integers(1, 9, L),
            mel=rng.normal(size=(L, 80)).astype(np.float32),
            pitch=rng.normal(size=L).astype(np.float32),   # frame-level!
            energy=rng.normal(size=L).astype(np.float32),
            duration=np.ones(L, np.int64), speaker=0, lang_id=0))
    text_buckets, mel_buckets = (8,), (16,)
    _, inferred = collate_batch(samples, text_buckets, mel_buckets)
    # inference sees len(pitch) == len(phonemes) and wrongly picks L
    assert inferred.pitches.shape[1] == 8
    _, explicit = collate_batch(
        samples, text_buckets, mel_buckets,
        pitch_feature="frame_level", energy_feature="frame_level")
    assert explicit.pitches.shape[1] == 16   # mel bucket
    assert explicit.energies.shape[1] == 16
    _, phoneme = collate_batch(
        samples, text_buckets, mel_buckets,
        pitch_feature="phoneme_level", energy_feature="phoneme_level")
    assert phoneme.pitches.shape[1] == 8     # text bucket
