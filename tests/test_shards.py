"""Packed training shards: format roundtrip, exact batch equality with the
reference collate (native + numpy fallback paths), datamodule wiring, and
the pack CLI."""
import numpy as np
import pytest

from fscl_tpu.data.batch import collate_batch
from fscl_tpu.data.shards import PackedShard, write_packed_split


def _samples(rng, n=6):
    out = []
    for i in range(n):
        L = int(rng.integers(4, 9))
        dur = rng.integers(1, 4, L).astype(np.int64)
        T = int(dur.sum())
        out.append(dict(
            id=f"u{i}", text="x",
            phonemes=rng.integers(1, 30, L).astype(np.int64),
            mel=rng.normal(size=(T, 80)).astype(np.float32),
            pitch=rng.normal(size=L).astype(np.float32),
            energy=rng.normal(size=L).astype(np.float32),
            duration=dur, speaker=int(i % 2), lang_id=3))
    return out


def test_packed_shard_matches_collate_batch(tmp_path):
    rng = np.random.default_rng(0)
    samples = _samples(rng)
    path = str(tmp_path / "train.txt.shard")
    write_packed_split(samples, path)
    shard = PackedShard(path)
    assert len(shard) == len(samples)
    assert shard.lengths() == [len(s["phonemes"]) for s in samples]

    idxs = [3, 0, 5]
    _, want = collate_batch([samples[i] for i in idxs])
    _, got = shard.collate(idxs)
    for name in ("speaker_args", "texts", "src_lens", "mels", "mel_lens",
                 "pitches", "energies", "durations", "lang_ids"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            err_msg=name)

    # numpy fallback reads the identical batch
    shard_np = PackedShard(path)
    shard_np._native = None
    _, got_np = shard_np.collate(idxs)
    for name in ("texts", "mels", "pitches", "energies", "durations"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got_np, name)),
            np.asarray(getattr(got, name)), err_msg=name)


def test_packed_shard_frame_level_padding(tmp_path):
    """frame_level variance targets pad to the mel bucket (the shard path
    honours the same explicit level contract as collate_batch)."""
    rng = np.random.default_rng(1)
    samples = _samples(rng, n=3)
    for s in samples:   # frame-level pitch/energy have mel length
        T = len(s["mel"])
        s["pitch"] = rng.normal(size=T).astype(np.float32)
        s["energy"] = rng.normal(size=T).astype(np.float32)
    path = str(tmp_path / "s.shard")
    write_packed_split(samples, path)
    shard = PackedShard(path)
    _, got = shard.collate([0, 1, 2], pitch_feature="frame_level",
                           energy_feature="frame_level")
    assert got.pitches.shape == got.mels.shape[:2]
    assert got.energies.shape == got.mels.shape[:2]
    _, want = collate_batch(samples, pitch_feature="frame_level",
                            energy_feature="frame_level")
    np.testing.assert_array_equal(got.pitches, want.pitches)


def test_pack_cli_and_datamodule_pickup(tmp_path):
    """`fscl_tpu pack` writes the shard and FastSpeech2DataModule prefers
    it; batches equal the python path."""
    import jax

    from fscl_tpu.cli.__main__ import main
    from fscl_tpu.core.config import (
        ModelConfig, TrainConfig, read_data_config,
    )
    from fscl_tpu.data.datamodules import FastSpeech2DataModule
    from fscl_tpu.data.scripts import make_synthetic_corpus

    cfg_path = make_synthetic_corpus(str(tmp_path / "corpus"), n_utts=8,
                                     seed=5)
    rc = main(["pack", "--data_config", cfg_path])
    assert rc == 0
    dc = read_data_config(cfg_path)
    import os
    shard_path = dc.subset_path("train") + ".shard"
    assert os.path.isfile(shard_path)

    model_cfg = ModelConfig()
    dm = FastSpeech2DataModule([dc], model_cfg, TrainConfig(), re_id=False)
    dm.setup()
    assert dm._shard is not None
    batch = next(dm.train_batches())
    assert np.isfinite(batch.mels).all()
    assert 0 < batch.texts.shape[0] <= TrainConfig().optim.batch_size

    # equality against the pure-python datamodule path on a fixed batch
    dm_py = FastSpeech2DataModule([dc], model_cfg, TrainConfig(),
                                  re_id=False, native_io=False)
    dm_py.setup()
    ds = dm_py.train_set.datasets[0]
    idxs = list(range(4))
    _, want = collate_batch([ds[i] for i in idxs], **dm_py._var_kw)
    _, got = dm._shard.collate(idxs, **dm._var_kw)
    for name in ("texts", "mels", "pitches", "energies", "durations",
                 "speaker_args", "lang_ids"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            err_msg=name)


def test_stale_shard_rejected(tmp_path):
    """A shard whose record count mismatches the split is ignored."""
    from fscl_tpu.core.config import ModelConfig, TrainConfig, read_data_config
    from fscl_tpu.data.datamodules import FastSpeech2DataModule
    from fscl_tpu.data.scripts import make_synthetic_corpus

    cfg_path = make_synthetic_corpus(str(tmp_path / "corpus"), n_utts=8,
                                     seed=6)
    dc = read_data_config(cfg_path)
    rng = np.random.default_rng(2)
    write_packed_split(_samples(rng, n=2),
                       dc.subset_path("train") + ".shard")
    dm = FastSpeech2DataModule([dc], ModelConfig(), TrainConfig(),
                               re_id=False)
    dm.setup()
    assert dm._shard is None   # stale -> fell back


def test_fscl_episode_shard(tmp_path):
    """FSCL episodic shards: coverage split + SupInfo + query batch equal
    the collate_episode path on the same samples."""
    import jax

    from fscl_tpu.core.config import ModelConfig, read_data_config
    from fscl_tpu.data.datasets import FSCLDataset
    from fscl_tpu.data.episodic import collate_episode
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.scripts import make_synthetic_corpus
    from fscl_tpu.data.shards import PackedShard, pack_fscl_split_from_store

    cfg_path = make_synthetic_corpus(str(tmp_path / "corpus"), n_utts=10,
                                     seed=9)
    dc = read_data_config(cfg_path)
    model_cfg = ModelConfig()
    store = FeatureStore(dc.data_dir)
    split = dc.subset_path("train")
    shard_path = split + ".fscl.shard"
    pack_fscl_split_from_store(split, store, dc, model_cfg, shard_path)
    shard = PackedShard(shard_path)

    ds = FSCLDataset(split, store, dc, model_cfg)
    idxs = list(range(6))
    want = collate_episode([ds[i] for i in idxs], shots=4, queries=2,
                           bucket=True)
    got = shard.collate_episode(idxs, shots=4, queries=2)

    assert got.sup.n_symbols == want.sup.n_symbols
    np.testing.assert_array_equal(got.sup.phonemes, want.sup.phonemes)
    np.testing.assert_array_equal(got.sup.avg_frames, want.sup.avg_frames)
    np.testing.assert_array_equal(got.sup.wav_lens, want.sup.wav_lens)
    # same wav content (bucket may differ only if max lens differ — same
    # samples, same buckets)
    np.testing.assert_array_equal(got.sup.wavs, want.sup.wavs)
    np.testing.assert_array_equal(got.qry.texts, want.qry.texts)
    np.testing.assert_array_equal(got.qry.mels, want.qry.mels)
    np.testing.assert_array_equal(got.qry.durations, want.qry.durations)

    # numpy fallback agrees with the native rows reader
    shard_np = PackedShard(shard_path)
    shard_np._native = None
    shard_np._native_rows = None
    got_np = shard_np.collate_episode(idxs, shots=4, queries=2)
    np.testing.assert_array_equal(got_np.sup.wavs, got.sup.wavs)


def test_multilingual_joint_training_shards(tmp_path):
    """Multi-corpus joint training over per-corpus shards: collate-time
    re-id offsets, joint buckets, stitched rows == the python path."""
    from fscl_tpu.cli.__main__ import main
    from fscl_tpu.core.config import ModelConfig, TrainConfig, read_data_config
    from fscl_tpu.data.datamodules import FastSpeech2DataModule
    from fscl_tpu.data.scripts import make_synthetic_corpus
    from fscl_tpu.data.shards import MultiShardCollate

    # two "languages" sharing the en symbol set (re-id offsets apply only
    # when symbol sets differ, but speaker offsets always do)
    cfgs = []
    for i in range(2):
        p = make_synthetic_corpus(
            str(tmp_path / f"c{i}"), name=f"lang{i}", n_utts=8,
            seed=10 + i, lang_id=i)
        assert main(["pack", "--data_config", p]) == 0
        cfgs.append(read_data_config(p))

    model_cfg = ModelConfig()
    dm = FastSpeech2DataModule(cfgs, model_cfg, TrainConfig(), re_id=True)
    dm.setup()
    assert isinstance(dm._shard, MultiShardCollate)
    assert len(dm._shard) == sum(
        len(d) for d in dm.train_set.datasets)

    dm_py = FastSpeech2DataModule(cfgs, model_cfg, TrainConfig(),
                                  re_id=True, native_io=False)
    dm_py.setup()
    # a batch spanning both corpora
    n0 = len(dm_py.train_set.datasets[0])
    idxs = [0, 1, n0, n0 + 1, 2, n0 + 2]
    _, want = __import__("fscl_tpu.data.batch", fromlist=["collate_batch"]
                         ).collate_batch(
        [dm_py.train_set[i] for i in idxs], **dm_py._var_kw)
    _, got = dm._shard.collate(idxs, **dm._var_kw)
    for name in ("texts", "src_lens", "mels", "mel_lens", "pitches",
                 "energies", "durations", "speaker_args", "lang_ids"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            err_msg=name)
    # speaker re-id really happened (corpus 1's speaker is offset by
    # corpus 0's speaker count)
    assert got.speaker_args[2] == dm_py.train_set.datasets[1].speaker_offset


def test_shard_compat_gating(tmp_path):
    """A shard packed under a different variance config or stats is
    rejected at datamodule setup (silent-misalignment guard)."""
    import dataclasses

    from fscl_tpu.cli.__main__ import main
    from fscl_tpu.core.config import (
        ModelConfig, TrainConfig, VarianceConfig, read_data_config,
    )
    from fscl_tpu.data.datamodules import FastSpeech2DataModule
    from fscl_tpu.data.scripts import make_synthetic_corpus

    cfg_path = make_synthetic_corpus(str(tmp_path / "c"), n_utts=8, seed=3)
    assert main(["pack", "--data_config", cfg_path]) == 0  # phoneme_level
    dc = read_data_config(cfg_path)

    frame_cfg = dataclasses.replace(
        ModelConfig(), variance=VarianceConfig(
            pitch_feature="frame_level", energy_feature="frame_level"))
    dm = FastSpeech2DataModule([dc], frame_cfg, TrainConfig(), re_id=False)
    dm.setup()
    assert dm._shard is None          # incompatible -> python/native path

    dm_ok = FastSpeech2DataModule([dc], ModelConfig(), TrainConfig(),
                                  re_id=False)
    dm_ok.setup()
    assert dm_ok._shard is not None   # matching config -> shard


def test_shard_sample_and_cross_shard_episode(tmp_path):
    """PackedShard.sample() returns full dicts; episodes spanning shards
    (two corpora with one lang_id) collate through the generic path."""
    from fscl_tpu.core.config import ModelConfig, read_data_config
    from fscl_tpu.data.episodic import collate_episode
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.scripts import make_synthetic_corpus
    from fscl_tpu.data.shards import PackedShard, pack_fscl_split_from_store

    model_cfg = ModelConfig()
    shards = []
    for i in range(2):
        p = make_synthetic_corpus(str(tmp_path / f"c{i}"), n_utts=8,
                                  seed=20 + i, lang_id=0)
        dc = read_data_config(p)
        sp = dc.subset_path("train") + ".fscl.shard"
        pack_fscl_split_from_store(
            dc.subset_path("train"), FeatureStore(dc.data_dir), dc,
            model_cfg, sp)
        shards.append(PackedShard(sp))

    s = shards[0].sample(0)
    for key in ("phonemes", "mel", "pitch", "energy", "duration",
                "raw_feat", "avg_frames", "n_symbols"):
        assert key in s, key
    assert s["n_symbols"] > 0

    # 3 from shard 0 + 3 from shard 1 -> generic collate works
    samples = [shards[0].sample(i) for i in range(3)] + \
        [shards[1].sample(i) for i in range(3)]
    ep = collate_episode(samples, shots=4, queries=2)
    assert ep.sup.wavs.shape[0] == 4 and ep.qry.texts.shape[0] == 2
    assert np.isfinite(ep.qry.mels).all()


def test_fscl_shard_mel_upstream_rejected(tmp_path):
    import dataclasses

    from fscl_tpu.core.config import ModelConfig, UpstreamConfig, read_data_config
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.scripts import make_synthetic_corpus
    from fscl_tpu.data.shards import pack_fscl_split_from_store

    p = make_synthetic_corpus(str(tmp_path / "c"), n_utts=4, seed=4)
    dc = read_data_config(p)
    with pytest.raises(ValueError):
        pack_fscl_split_from_store(
            dc.subset_path("train"), FeatureStore(dc.data_dir), dc,
            ModelConfig(), str(tmp_path / "x.shard"), upstream="mel")


def test_int16_wav_wire_matches_f32_at_bf16():
    """int16 wire-format wavs (collate_episode wav_dtype="int16" ->
    frozen_upstream_features on-device dequant) produce hidden states
    matching the f32 wire within bf16 compute rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fscl_tpu.models.hubert import SSLUpstream, frozen_upstream_features
    from fscl_tpu.ops.masking import length_mask

    up = SSLUpstream(dim=16, n_layers=2, n_heads=2, ffn_dim=32)
    rng = np.random.default_rng(0)
    wavs = (rng.normal(size=(2, 8000)).astype(np.float32) * 0.3).clip(-1, 1)
    wav_lens = np.array([8000, 5000], np.int32)
    valid = length_mask(jnp.asarray(wav_lens), wavs.shape[-1])
    params = up.init(jax.random.PRNGKey(0), jnp.asarray(wavs))

    wavs_i16 = np.clip(np.rint(wavs * 32768.0), -32768, 32767) \
        .astype(np.int16)
    h_f32, v1 = frozen_upstream_features(
        up, params, jnp.asarray(wavs), valid, "bfloat16")
    h_i16, v2 = frozen_upstream_features(
        up, params, jnp.asarray(wavs_i16), valid, "bfloat16")
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    a, b = np.asarray(h_f32), np.asarray(h_i16)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() < 2e-2 * scale, (
        np.abs(a - b).max(), scale)


def test_pr_episode_shard(tmp_path):
    """PR episodes from an FSCL shard equal the PRDataset collate path on
    the same samples (same coverage split, same bucketing), and the PR
    episodic datamodule auto-prefers the shard."""
    from fscl_tpu.core.config import (
        ModelConfig, OptimConfig, TrainConfig, read_data_config,
    )
    from fscl_tpu.data.datamodules import PREpisodicDataModule
    from fscl_tpu.data.datasets import PRDataset
    from fscl_tpu.data.episodic import split_sup_qry
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.scripts import make_synthetic_corpus
    from fscl_tpu.data.shards import PackedShard, pack_fscl_split_from_store
    from fscl_tpu.frontend import n_symbols as n_sym_of
    from fscl_tpu.systems.pr import PREpisode

    cfg_path = make_synthetic_corpus(str(tmp_path / "corpus"), n_utts=10,
                                     seed=11)
    dc = read_data_config(cfg_path)
    model_cfg = ModelConfig()
    store = FeatureStore(dc.data_dir)
    split = dc.subset_path("train")
    shard_path = split + ".fscl.shard"
    pack_fscl_split_from_store(split, store, dc, model_cfg, shard_path)
    shard = PackedShard(shard_path)

    ds = PRDataset(split, store, dc)
    idxs = list(range(6))
    n_sym = n_sym_of(dc.symbol_id)
    got = shard.collate_pr_episode(idxs, shots=4, queries=2,
                                   symbol_id=dc.symbol_id, n_symbols=n_sym)
    assert isinstance(got, PREpisode)

    # reference: the python datamodule collate on the same split
    samples = [ds[i] for i in idxs]
    sup_ids, qry_ids = split_sup_qry(samples, 4, 2)
    dm = PREpisodicDataModule([dc], model_cfg, TrainConfig(), shots=4,
                              queries=2)
    want_sup = dm._collate_pr(dc, [samples[i] for i in sup_ids])
    want_qry = dm._collate_pr(dc, [samples[i] for i in qry_ids])
    for got_b, want_b in ((got.sup, want_sup), (got.qry, want_qry)):
        assert got_b.symbol_id == want_b.symbol_id
        assert got_b.n_symbols == want_b.n_symbols
        np.testing.assert_array_equal(got_b.phonemes, want_b.phonemes)
        np.testing.assert_array_equal(got_b.avg_frames, want_b.avg_frames)
        np.testing.assert_array_equal(got_b.wav_lens, want_b.wav_lens)
        np.testing.assert_allclose(got_b.wavs, want_b.wavs, atol=1e-6)
        np.testing.assert_array_equal(got_b.lang_ids, want_b.lang_ids)

    # the datamodule picks the shard up automatically
    dm.setup()
    assert dm.datasets[0][2] is not None
    ep = next(dm.train_batches())
    assert isinstance(ep, PREpisode)
    assert ep.sup.wavs.ndim == 2 and ep.sup.n_symbols == n_sym


def test_t2u_episode_shard_sup(tmp_path):
    """T2U episodic loader serves the support side from an FSCL shard:
    SupInfo identical to the python collate_sup_info path on the same
    split indices."""
    from fscl_tpu.core.config import ModelConfig, read_data_config
    from fscl_tpu.data.datasets import FSCLDataset
    from fscl_tpu.data.episodic import collate_sup_info, split_sup_qry
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.data.scripts import make_synthetic_corpus
    from fscl_tpu.data.shards import PackedShard, pack_fscl_split_from_store

    cfg_path = make_synthetic_corpus(str(tmp_path / "corpus"), n_utts=10,
                                     seed=13)
    dc = read_data_config(cfg_path)
    model_cfg = ModelConfig()
    store = FeatureStore(dc.data_dir)
    split = dc.subset_path("train")
    shard_path = split + ".fscl.shard"
    pack_fscl_split_from_store(split, store, dc, model_cfg, shard_path)
    shard = PackedShard(shard_path)

    ds = FSCLDataset(split, store, dc, model_cfg)
    idxs = list(range(6))
    got_sup, got_sids, got_qids = shard.collate_fscl_sup(idxs, 4, 2)
    samples = [ds[i] for i in idxs]
    want_sids, want_qids = split_sup_qry(samples, 4, 2)
    assert got_sids == want_sids and got_qids == want_qids
    want_sup = collate_sup_info([samples[i] for i in want_sids])
    np.testing.assert_array_equal(got_sup.phonemes, want_sup.phonemes)
    np.testing.assert_array_equal(got_sup.avg_frames, want_sup.avg_frames)
    np.testing.assert_array_equal(got_sup.wav_lens, want_sup.wav_lens)
    np.testing.assert_allclose(got_sup.wavs, want_sup.wavs, atol=1e-6)
