"""T2U C/C2 variants + DAE2E combo."""
import jax
import numpy as np
import pytest

from fscl_tpu.core.config import (
    CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
    TransformerConfig, UpstreamConfig,
)
from fscl_tpu.data.batch import Batch, SupInfo
from fscl_tpu.models.hubert import SSLUpstream
from fscl_tpu.models.tacotron2_t2u import T2UConfig
from fscl_tpu.systems.t2u import (
    T2UBatch, T2UEpisode, TransEmbCT2USystem, TransEmbC2T2USystem,
)

N_SYM = 10
CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=32, encoder_head=2,
        decoder_head=2),
    codebook=CodebookConfig(size=4, num_heads=2, dim=16),
    upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2),
    speaker=SpeakerConfig(n_speakers=4))
TINY = SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32)
TCFG = T2UConfig(
    n_units=12, d_unit=16, symbols_embedding_dim=16,
    encoder_embedding_dim=32, prenet_dim=16, attention_rnn_dim=32,
    decoder_rnn_dim=32, attention_dim=16,
    attention_location_n_filters=4, attention_location_kernel_size=7)

B, L, TU = 2, 6, 8


def make_episode(rng):
    sup = SupInfo(
        wavs=rng.normal(size=(2, 8000)).astype(np.float32),
        wav_lens=np.full((2,), 8000, np.int32),
        avg_frames=rng.integers(0, 4, (2, L)).astype(np.int32),
        phonemes=rng.integers(1, N_SYM, (2, L)).astype(np.int32),
        n_symbols=N_SYM)
    qry = T2UBatch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        unit_lens=np.full((B,), TU, np.int32),
        lang_ids=np.zeros(B, np.int32))
    return T2UEpisode(sup=sup, qry=qry)


@pytest.mark.parametrize("cls", [TransEmbCT2USystem, TransEmbC2T2USystem])
def test_t2u_codebook_variants(cls):
    rng = np.random.default_rng(0)
    episode = make_episode(rng)
    system = cls(CFG, OptimConfig(), N_SYM, TCFG, upstream=TINY)
    state = system.init_state(jax.random.PRNGKey(0), episode)
    state, metrics = jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))


def test_dae2e_tune():
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.t2u_tune import DAE2EBatch, DAE2ETuneSystem
    rng = np.random.default_rng(1)
    u2s_cfg = ModelConfig(
        transformer=CFG.transformer, max_seq_len=16,
        speaker=SpeakerConfig(n_speakers=4))
    u2s = BaselineSystem(u2s_cfg, OptimConfig(), (("unit", TCFG.n_units),))
    dur = rng.integers(1, 3, (B, TU)).astype(np.int32)
    u2s_b = Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        src_lens=np.full((B,), TU, np.int32),
        mels=rng.normal(size=(B, 16, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), 16).astype(np.int32),
        pitches=rng.normal(size=(B, TU)).astype(np.float32),
        energies=rng.normal(size=(B, TU)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))
    u2s_state = u2s.init_state(jax.random.PRNGKey(0), u2s_b)
    episode = make_episode(rng)
    batch = DAE2EBatch(
        t2u=episode.qry, u2s=u2s_b,
        real_units=rng.integers(1, TCFG.n_units, (B, TU)).astype(np.int32),
        real_unit_lens=np.full((B,), TU, np.int32))
    system = DAE2ETuneSystem(CFG, OptimConfig(), (("en", N_SYM),), TCFG,
                             u2s, u2s_state.params, u2s_state.batch_stats)
    state = system.init_state(jax.random.PRNGKey(1), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["Total Loss"]))
    assert "DA Loss" in metrics and "U2S Loss" in metrics
