"""ADA, ContiAE, semi, T2U tune-family system tests (tiny models)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fscl_tpu.core.config import (
    CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
    TransformerConfig, UpstreamConfig,
)
from fscl_tpu.data.batch import Batch, SupInfo
from fscl_tpu.models.hubert import SSLUpstream
from fscl_tpu.models.tacotron2_t2u import T2UConfig
from fscl_tpu.systems.fscl import Episode

N_SYM = 10
CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=32, encoder_head=2,
        decoder_head=2),
    codebook=CodebookConfig(size=4, num_heads=2, dim=32),
    upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2),
    max_seq_len=16,
    speaker=SpeakerConfig(n_speakers=4),
)
TINY = SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32)
TCFG = T2UConfig(
    n_units=12, d_unit=16, symbols_embedding_dim=16,
    encoder_embedding_dim=32, prenet_dim=16, attention_rnn_dim=32,
    decoder_rnn_dim=32, attention_dim=16,
    attention_location_n_filters=4, attention_location_kernel_size=7)


def make_batch(rng, B=2, L=6, T=16):
    dur = rng.integers(1, 3, (B, L)).astype(np.int32)
    return Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        mels=rng.normal(size=(B, T, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
        pitches=rng.normal(size=(B, L)).astype(np.float32),
        energies=rng.normal(size=(B, L)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))


def make_sup(rng, B=2, L=6):
    return SupInfo(
        wavs=rng.normal(size=(B, 8000)).astype(np.float32),
        wav_lens=np.full((B,), 8000, np.int32),
        avg_frames=rng.integers(0, 4, (B, L)).astype(np.int32),
        phonemes=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        n_symbols=N_SYM)


@pytest.mark.parametrize("stage", ["matching", "unsup_tuning"])
def test_ada_system(stage):
    from fscl_tpu.systems.ada import TransEmbADASystem
    rng = np.random.default_rng(0)
    episode = Episode(sup=make_sup(rng), qry=make_batch(rng))
    system = TransEmbADASystem(CFG, OptimConfig(), N_SYM, upstream=TINY,
                               ada_stage=stage)
    state = system.init_state(jax.random.PRNGKey(0), episode)
    state2, metrics = jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))
    if stage == "matching":
        # ada params move, model encoder params frozen
        moved = jax.tree_util.tree_map(
            lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
            state.params["ada"], state2.params["ada"])
        assert any(jax.tree_util.tree_leaves(moved))
        frozen = jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            state.params["model"], state2.params["model"])
        assert all(jax.tree_util.tree_leaves(frozen))


def test_ssl_ada_system():
    from fscl_tpu.systems.ada import SSLEpisode, TransEmbSSLADASystem
    rng = np.random.default_rng(5)
    episode = SSLEpisode(
        sup=make_sup(rng), qry=make_batch(rng),
        qry_wavs=rng.normal(size=(2, 8000)).astype(np.float32),
        qry_wav_lens=np.full((2,), 8000, np.int32))
    system = TransEmbSSLADASystem(CFG, OptimConfig(), N_SYM, upstream=TINY,
                                  ada_stage="matching", ssl_layer_idx=1)
    state = system.init_state(jax.random.PRNGKey(0), episode)
    state, metrics = jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))


def test_conti_ae():
    from fscl_tpu.systems.conti_ae import ContiAEBatch, ContiAESystem
    rng = np.random.default_rng(1)
    batch = ContiAEBatch(
        wavs=rng.normal(size=(2, 8000)).astype(np.float32),
        wav_lens=np.full((2,), 8000, np.int32),
        mels=rng.normal(size=(2, 20, 80)).astype(np.float32),
        mel_lens=np.array([20, 14], np.int32))
    system = ContiAESystem(CFG, OptimConfig(), upstream=TINY, layer_idx=1)
    state = system.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))


def test_e2e_tune_chain():
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.t2u import T2UBatch
    from fscl_tpu.systems.t2u_tune import E2EBatch, E2ETuneSystem
    rng = np.random.default_rng(2)
    u2s = BaselineSystem(CFG, OptimConfig(), (("unit", TCFG.n_units),))
    u2s_batch = make_batch(rng)
    u2s_state = u2s.init_state(jax.random.PRNGKey(0), u2s_batch)

    B, L, TU = 2, 6, 8
    t2u_batch = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32))
    # u2s batch whose texts are the unit sequence
    u2s_b = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=t2u_batch.units, src_lens=np.full((B,), TU, np.int32),
        mels=rng.normal(size=(B, 16, 80)).astype(np.float32),
        mel_lens=np.full((B,), 16, np.int32),
        pitches=rng.normal(size=(B, TU)).astype(np.float32),
        energies=rng.normal(size=(B, TU)).astype(np.float32),
        durations=np.full((B, TU), 2, np.int32),
        lang_ids=np.zeros(B, np.int32))
    batch = E2EBatch(t2u=t2u_batch, u2s=u2s_b)
    system = E2ETuneSystem(CFG, OptimConfig(), (("en", N_SYM),), TCFG,
                           u2s, u2s_state.params, u2s_state.batch_stats)
    state = system.init_state(jax.random.PRNGKey(1), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["Total Loss"]))
    assert float(metrics["U2S Loss"]) > 0


def test_e2e_tune_chain_bucket_edge():
    """Regression (round-4 full-preset rehearsal): the t2u side pads units
    (incl. <eos>) to its own bucket while the u2s side strips <eos> and
    buckets independently — at a bucket edge the padded lengths diverge
    (e.g. 9 units -> 16 on the t2u side vs 8 on the u2s side). u2s_forward
    must reconcile to the u2s padded length."""
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.t2u import T2UBatch
    from fscl_tpu.systems.t2u_tune import E2EBatch, E2ETuneSystem
    rng = np.random.default_rng(7)
    u2s = BaselineSystem(CFG, OptimConfig(), (("unit", TCFG.n_units),))
    u2s_state = u2s.init_state(jax.random.PRNGKey(0), make_batch(rng))

    B, L, TU = 2, 6, 8          # 8 valid units
    units = rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32)
    # t2u view: units + eos, padded past the u2s bucket (16 > 8)
    t2u_units = np.zeros((B, 2 * TU), np.int32)
    t2u_units[:, :TU] = units
    t2u_units[:, TU] = 1        # eos token slot
    t2u_batch = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        units=t2u_units,
        unit_lens=np.full((B,), TU + 1, np.int32),
        lang_ids=np.zeros(B, np.int32))
    u2s_b = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=units, src_lens=np.full((B,), TU, np.int32),
        mels=rng.normal(size=(B, 16, 80)).astype(np.float32),
        mel_lens=np.full((B,), 16, np.int32),
        pitches=rng.normal(size=(B, TU)).astype(np.float32),
        energies=rng.normal(size=(B, TU)).astype(np.float32),
        durations=np.full((B, TU), 2, np.int32),
        lang_ids=np.zeros(B, np.int32))
    batch = E2EBatch(t2u=t2u_batch, u2s=u2s_b)
    system = E2ETuneSystem(CFG, OptimConfig(), (("en", N_SYM),), TCFG,
                           u2s, u2s_state.params, u2s_state.batch_stats)
    state = system.init_state(jax.random.PRNGKey(1), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["Total Loss"]))
    assert float(metrics["U2S Loss"]) > 0


def test_da_tune():
    from fscl_tpu.systems.t2u import T2UBatch
    from fscl_tpu.systems.t2u_tune import DABatch, DATuneSystem
    rng = np.random.default_rng(3)
    B, L, TU = 2, 6, 8
    t2u_batch = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32))
    batch = DABatch(
        t2u=t2u_batch,
        real_units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        real_unit_lens=np.full((B,), TU, np.int32))
    system = DATuneSystem(CFG, OptimConfig(), (("en", N_SYM),), TCFG)
    state = system.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))
    assert np.isfinite(float(metrics["DA Loss"]))


def test_t2u_tune_init():
    from fscl_tpu.systems.t2u import TacoT2USystem, T2UBatch, TransEmbT2USystem
    from fscl_tpu.systems.t2u_tune import t2u_tune_init
    rng = np.random.default_rng(4)
    fscl = TransEmbT2USystem(CFG, OptimConfig(), N_SYM, TCFG, upstream=TINY)
    from fscl_tpu.systems.t2u import T2UEpisode
    B, L, TU = 2, 6, 8
    qry = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32))
    episode = T2UEpisode(sup=make_sup(rng), qry=qry)
    fscl_state = fscl.init_state(jax.random.PRNGKey(0), episode)

    t2u = TacoT2USystem(CFG, OptimConfig(), (("ko", N_SYM),), TCFG)
    t2u_state = t2u.init_state(jax.random.PRNGKey(1), qry)
    new_params = t2u_tune_init(fscl, fscl_state.params, t2u,
                               t2u_state.params, [make_sup(rng)], "ko")
    assert new_params["embedding"]["table-ko"].shape == (N_SYM, 16)
