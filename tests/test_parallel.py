"""Mesh/pjit data-parallel tests on the 8-device virtual CPU mesh."""
import jax
import numpy as np
import pytest

from fscl_tpu.core.config import (
    ModelConfig, OptimConfig, SpeakerConfig, TrainConfig, TransformerConfig,
)
from fscl_tpu.data.batch import Batch
from fscl_tpu.parallel.mesh import make_mesh, replicate
from fscl_tpu.systems.baseline import BaselineSystem
from fscl_tpu.train.trainer import make_parallel_train_step, place_batch

CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=32, encoder_head=2,
        decoder_head=2),
    max_seq_len=16, speaker=SpeakerConfig(n_speakers=8))

N_SYM = 20


def make_batch(rng, B):
    dur = rng.integers(1, 3, (B, 8)).astype(np.int32)
    return Batch(
        speaker_args=(np.arange(B) % 8).astype(np.int32),
        texts=rng.integers(1, N_SYM, (B, 8)).astype(np.int32),
        src_lens=np.full((B,), 8, np.int32),
        mels=rng.normal(size=(B, 16, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), 16).astype(np.int32),
        pitches=rng.normal(size=(B, 8)).astype(np.float32),
        energies=rng.normal(size=(B, 8)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_step_matches_single_device():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, 16)
    system = BaselineSystem(CFG, OptimConfig(), (("en", N_SYM),))
    state = system.init_state(jax.random.PRNGKey(0), batch)

    # single-device step
    s1, m1 = jax.jit(system.train_step)(state, batch, jax.random.PRNGKey(1))

    # 8-way data-parallel step on the same batch
    mesh = make_mesh(n_data=8)
    state_r = replicate(
        system.init_state(jax.random.PRNGKey(0), batch), mesh)
    step = make_parallel_train_step(system, mesh)
    s8, m8 = step(state_r, place_batch(batch, mesh), jax.random.PRNGKey(1))

    # losses agree (same data, same params; grads all-reduced by XLA)
    np.testing.assert_allclose(
        float(m1["Total Loss"]), float(m8["Total Loss"]), rtol=1e-4)
    # params close after one step (fp reassociation across shards allowed)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(s8.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
