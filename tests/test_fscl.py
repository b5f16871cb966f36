"""FSCL meta-system tests: episode step end-to-end on tiny shapes."""
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
from fscl_tpu.systems.fscl import Episode, TransEmbSystem, transplant_embedding

N_SYM = 16

CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=64,
        decoder_hidden=64, conv_filter_size=64,
    ),
    codebook=CodebookConfig(size=8, num_heads=2, dim=64),
    upstream=UpstreamConfig(name="tiny", dim=32, n_layers=3),
    max_seq_len=32,
    speaker=SpeakerConfig(n_speakers=4),
)

TINY_UPSTREAM = SSLUpstream(dim=32, n_layers=2, n_heads=2, ffn_dim=64)


def make_episode(rng):
    Bs, Bq, L, T, W = 3, 2, 8, 24, 16000
    sup = SupInfo(
        wavs=rng.normal(size=(Bs, W)).astype(np.float32),
        wav_lens=np.array([W, W // 2, W], np.int32),
        avg_frames=rng.integers(0, 6, (Bs, L)).astype(np.int32),
        phonemes=rng.integers(1, N_SYM, (Bs, L)).astype(np.int32),
        n_symbols=N_SYM,
    )
    dur = rng.integers(1, 3, (Bq, L)).astype(np.int32)
    qry = Batch(
        speaker_args=np.zeros(Bq, np.int32),
        texts=rng.integers(1, N_SYM, (Bq, L)).astype(np.int32),
        src_lens=np.full((Bq,), L, np.int32),
        mels=rng.normal(size=(Bq, T, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
        pitches=rng.normal(size=(Bq, L)).astype(np.float32),
        energies=rng.normal(size=(Bq, L)).astype(np.float32),
        durations=dur,
        lang_ids=np.zeros(Bq, np.int32),
    )
    return Episode(sup=sup, qry=qry)


@pytest.fixture(scope="module")
def system_and_state():
    system = TransEmbSystem(CFG, OptimConfig(), N_SYM, upstream=TINY_UPSTREAM)
    episode = make_episode(np.random.default_rng(0))
    state = system.init_state(jax.random.PRNGKey(0), episode)
    return system, state, episode


def test_episode_train_step(system_and_state):
    system, state, episode = system_and_state
    train_step = jax.jit(system.train_step)
    state2, metrics = train_step(state, episode, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))
    assert int(state2.step) == 1
    # upstream params unchanged (frozen, not even in the optimizer)
    # and codebook params actually updated
    same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        state.params["codebook"], state2.params["codebook"])
    assert not all(jax.tree_util.tree_leaves(same)), "codebook should train"


def test_embedding_table_pad_zero(system_and_state):
    system, state, episode = system_and_state
    hidden, _ = system.extract_ssl(
        jnp.asarray(episode.sup.wavs), jnp.asarray(episode.sup.wav_lens))
    table = system.build_embedding_table(state.params, hidden, episode.sup)
    assert table.shape == (N_SYM, 64)
    np.testing.assert_array_equal(np.asarray(table[0]), 0.0)
    assert not bool(jnp.any(jnp.isnan(table)))


def test_transplant_embedding():
    from fscl_tpu.frontend import n_symbols
    from fscl_tpu.systems.baseline import BaselineSystem
    rng = np.random.default_rng(1)
    bl = BaselineSystem(CFG, OptimConfig(), (("ko-test", N_SYM),))
    dur = rng.integers(1, 3, (2, 8)).astype(np.int32)
    batch = Batch(
        speaker_args=np.zeros(2, np.int32),
        texts=rng.integers(1, N_SYM, (2, 8)).astype(np.int32),
        src_lens=np.full((2,), 8, np.int32),
        mels=rng.normal(size=(2, 24, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), 24).astype(np.int32),
        pitches=rng.normal(size=(2, 8)).astype(np.float32),
        energies=rng.normal(size=(2, 8)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(2, np.int32),
    )
    state = bl.init_state(jax.random.PRNGKey(0), batch)
    new_table = jnp.ones((N_SYM, 64))
    new_params = transplant_embedding(state.params, new_table, "ko-test")
    np.testing.assert_array_equal(
        np.asarray(new_params["embedding"]["table-ko-test"]), 1.0)
    # original untouched (functional update)
    assert not np.allclose(
        np.asarray(state.params["embedding"]["table-ko-test"]), 1.0)


def test_hubert_shapes():
    up = SSLUpstream(dim=32, n_layers=2, n_heads=2, ffn_dim=64)
    wav = jnp.zeros((2, 16000))
    variables = up.init(jax.random.PRNGKey(0), wav)
    hidden, valid = up.apply(variables, wav)
    assert hidden.shape[0] == 2 and hidden.shape[2] == 3  # conv-out + 2 layers
    assert hidden.shape[3] == 32
    from fscl_tpu.models.hubert import ssl_num_frames
    assert hidden.shape[1] == ssl_num_frames(16000)
