"""PR systems tests on tiny upstream."""
import jax
import numpy as np
import pytest

from fscl_tpu.core.config import ModelConfig, OptimConfig, TransformerConfig, UpstreamConfig
from fscl_tpu.models.hubert import SSLUpstream
from fscl_tpu.systems.pr import (
    PRBatch, PREpisode, SSLClusterSystem, SSLLinearSystem, SSLProtoNetSystem,
)

CFG = ModelConfig(
    transformer=TransformerConfig(encoder_hidden=32, encoder_head=2),
    upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2),
)
TINY = SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32)
N_SYM = 8


def make_pr_batch(rng, B=2, L=5):
    return PRBatch(
        wavs=rng.normal(size=(B, 8000)).astype(np.float32),
        wav_lens=np.array([8000] * B, np.int32),
        avg_frames=rng.integers(1, 5, (B, L)).astype(np.int32),
        phonemes=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        lang_ids=np.zeros(B, np.int32),
        n_symbols=N_SYM,
        symbol_id="en-test",
    )


@pytest.mark.parametrize("cls", [SSLLinearSystem, SSLClusterSystem])
def test_pr_supervised_step(cls):
    rng = np.random.default_rng(0)
    batch = make_pr_batch(rng)
    system = cls(CFG, OptimConfig(), (("en-test", N_SYM),), upstream=TINY)
    state = system.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))
    assert 0.0 <= float(metrics["Acc"]) <= 1.0


def test_protonet_episode():
    rng = np.random.default_rng(1)
    episode = PREpisode(sup=make_pr_batch(rng, B=3), qry=make_pr_batch(rng, B=2))
    system = SSLProtoNetSystem(CFG, OptimConfig(), (("en-test", N_SYM),),
                               upstream=TINY)
    state = system.init_state(jax.random.PRNGKey(0), episode)
    state, metrics = jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))
    # prototypes for unseen symbols are zero
    protos = system.build_prototypes(state.params, episode.sup)
    import jax.numpy as jnp
    seen = set(np.unique(np.asarray(episode.sup.phonemes)[
        np.asarray(episode.sup.avg_frames) > 0]))
    for s in range(N_SYM):
        if s not in seen:
            np.testing.assert_array_equal(np.asarray(protos[s]), 0.0)


def test_trans_head_episode():
    """TransHead (TransHead.py:23-165): generated head + BiLSTM downstream;
    the head differs from a plain learned head and trains end-to-end."""
    from fscl_tpu.systems.pr import TransHeadPRSystem
    import dataclasses
    from fscl_tpu.core.config import CodebookConfig
    cfg = dataclasses.replace(
        CFG, codebook=CodebookConfig(size=4, num_heads=2, dim=32))
    rng = np.random.default_rng(2)
    episode = PREpisode(sup=make_pr_batch(rng, B=3), qry=make_pr_batch(rng, B=2))
    system = TransHeadPRSystem(cfg, OptimConfig(), (("en-test", N_SYM),),
                               upstream=TINY)
    state = system.init_state(jax.random.PRNGKey(0), episode)
    head, _ = system.build_head_weights(state.params, episode.sup)
    assert head.shape == (N_SYM, cfg.transformer.encoder_hidden)

    losses = []
    for i in range(3):
        state, metrics = jax.jit(system.train_step)(
            state, episode, jax.random.PRNGKey(i))
        losses.append(float(metrics["Total Loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # the generated head depends on the support set: a different support
    # batch yields different head weights
    other = make_pr_batch(np.random.default_rng(9), B=3)
    head2, _ = system.build_head_weights(state.params, other)
    assert not np.allclose(np.asarray(head), np.asarray(head2), atol=1e-5)


def test_trans_head_registered():
    import fscl_tpu.data.datamodules  # registers DATAMODULES entries
    from fscl_tpu.core.registry import DATAMODULES, SYSTEMS
    from fscl_tpu.systems.pr import SSLBaselineSystem, TransHeadPRSystem
    for key in ("pr-trans-head", "pr-trans-head-tune", "pr-fscl",
                "pr-fscl-tune"):
        assert SYSTEMS.get(key) is TransHeadPRSystem
        assert DATAMODULES.get(key).__name__ == "PREpisodicDataModule"
    assert SYSTEMS.get("pr-ssl-baseline") is SSLBaselineSystem
