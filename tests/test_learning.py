"""Learning tests: the training loop actually learns (loss drops
substantially when overfitting a tiny corpus) — supervised and FSCL."""
import numpy as np
import pytest

from fscl_tpu.core.config import (
    CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
    TransformerConfig, UpstreamConfig,
)
from fscl_tpu.data.batch import Batch, SupInfo

TINY = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=64, encoder_head=2,
        decoder_head=2, encoder_dropout=0.0, decoder_dropout=0.0),
    codebook=CodebookConfig(size=8, num_heads=2, dim=32),
    upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2),
    max_seq_len=32, speaker=SpeakerConfig(n_speakers=2))
N_SYM = 12


def fixed_batch(seed=0, B=4, L=8, T=24):
    rng = np.random.default_rng(seed)
    dur = rng.integers(2, 4, (B, L)).astype(np.int32)
    return Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        mels=rng.normal(size=(B, T, 80)).astype(np.float32) * 0.5,
        mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
        pitches=rng.normal(size=(B, L)).astype(np.float32),
        energies=rng.normal(size=(B, L)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))


def test_supervised_overfits_fixed_batch():
    import jax
    from fscl_tpu.systems.baseline import BaselineSystem
    system = BaselineSystem(
        TINY, OptimConfig(lr=2e-3, warmup_step=10, anneal_steps=()),
        (("en", N_SYM),))
    batch = fixed_batch()
    state = system.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(system.train_step)
    losses = []
    for i in range(120):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["Total Loss"]))
    assert losses[-1] < losses[0] * 0.35, (losses[0], losses[-1])


def test_fscl_episode_overfits():
    import jax
    from fscl_tpu.models.hubert import SSLUpstream
    from fscl_tpu.systems.fscl import Episode, TransEmbSystem
    rng = np.random.default_rng(1)
    sup = SupInfo(
        wavs=rng.normal(size=(3, 8000)).astype(np.float32),
        wav_lens=np.full((3,), 8000, np.int32),
        avg_frames=rng.integers(1, 4, (3, 8)).astype(np.int32),
        phonemes=rng.integers(1, N_SYM, (3, 8)).astype(np.int32),
        n_symbols=N_SYM)
    episode = Episode(sup=sup, qry=fixed_batch(seed=2))
    system = TransEmbSystem(
        TINY, OptimConfig(lr=2e-3, warmup_step=10, anneal_steps=()),
        N_SYM, upstream=SSLUpstream(dim=16, n_layers=1, n_heads=2,
                                    ffn_dim=32))
    state = system.init_state(jax.random.PRNGKey(0), episode)
    step = jax.jit(system.train_step)
    losses = []
    for i in range(120):
        state, metrics = step(state, episode, jax.random.PRNGKey(i))
        losses.append(float(metrics["Total Loss"]))
    assert losses[-1] < losses[0] * 0.4, (losses[0], losses[-1])
