"""Tensor-parallel extension: 4x2 (data x model) mesh training step."""
import jax
import numpy as np
import pytest

from fscl_tpu.core.config import (
    ModelConfig, OptimConfig, SpeakerConfig, TransformerConfig,
)
from fscl_tpu.data.batch import Batch
from fscl_tpu.parallel.mesh import make_mesh
from fscl_tpu.parallel.tensor_parallel import (
    fastspeech2_param_spec, make_tp_train_step, shard_state,
)
from fscl_tpu.systems.baseline import BaselineSystem
from fscl_tpu.train.trainer import place_batch

CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=64, encoder_head=2,
        decoder_head=2),
    max_seq_len=16, speaker=SpeakerConfig(n_speakers=4))
N_SYM = 20


def make_batch(rng, B):
    dur = rng.integers(1, 3, (B, 8)).astype(np.int32)
    return Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, 8)).astype(np.int32),
        src_lens=np.full((B,), 8, np.int32),
        mels=rng.normal(size=(B, 16, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), 16).astype(np.int32),
        pitches=rng.normal(size=(B, 8)).astype(np.float32),
        energies=rng.normal(size=(B, 8)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))


def test_param_spec_shards_ffn_and_heads():
    from jax.sharding import PartitionSpec as P
    assert fastspeech2_param_spec(
        "model.encoder.stack.layer_0.pos_ffn.w_1.kernel", None) == \
        P(None, None, "model")
    assert fastspeech2_param_spec(
        "model.decoder.stack.layer_0.slf_attn.fc.kernel", None) == \
        P("model", None)
    assert fastspeech2_param_spec("embedding.table-en", None) == P()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_step_matches_dp():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, 8)
    system = BaselineSystem(CFG, OptimConfig(), (("en", N_SYM),))
    state = system.init_state(jax.random.PRNGKey(0), batch)
    s_ref, m_ref = jax.jit(system.train_step)(
        state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(n_data=4, n_model=2)
    state2 = system.init_state(jax.random.PRNGKey(0), batch)
    state2 = shard_state(state2, mesh)
    step = make_tp_train_step(system, mesh, example_state=state2)
    s_tp, m_tp = step(state2, place_batch(batch, mesh),
                      jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m_ref["Total Loss"]), float(m_tp["Total Loss"]), rtol=1e-4)
    # a TP-sharded FFN kernel really is distributed over the model axis
    k = s_tp.params["model"]["encoder"]["stack"]["layer_0"]["pos_ffn"]["w_1"]["kernel"]
    assert "model" in str(k.sharding.spec)


def test_upstream_param_spec_both_layouts():
    from jax.sharding import PartitionSpec as P
    from fscl_tpu.parallel.tensor_parallel import (
        frozen_spec, upstream_param_spec,
    )
    # per-layer layout
    assert upstream_param_spec("layer_3.q_proj.kernel", None) == \
        P(None, "model")
    assert upstream_param_spec("layer_3.out_proj.kernel", None) == \
        P("model", None)
    assert upstream_param_spec("layer_0.fc1.bias", None) == P("model")
    assert upstream_param_spec("layer_0.self_attn_layer_norm.scale",
                               None) == P()
    # scan layout: leading layer axis shifts every spec by one
    assert upstream_param_spec("layers.fc1.kernel", None) == \
        P(None, None, "model")
    assert upstream_param_spec("layers.fc2.kernel", None) == \
        P(None, "model", None)
    # frozen wrapper: upstream sharded, other frozen collections replicated
    assert frozen_spec("upstream.params.layer_0.fc1.kernel", None) == \
        P(None, "model")
    assert frozen_spec("u2s.model.decoder.whatever", None) == P()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fscl_upstream_tp_matches_single_device():
    """FSCL episode step with the frozen upstream TP-sharded over the model
    axis matches the unsharded step (VERDICT r2 #8)."""
    import dataclasses
    from fscl_tpu.core.config import CodebookConfig, UpstreamConfig
    from fscl_tpu.data.batch import SupInfo
    from fscl_tpu.models.hubert import SSLUpstream
    from fscl_tpu.systems.fscl import Episode, TransEmbSystem

    cfg = dataclasses.replace(
        CFG,
        codebook=CodebookConfig(size=4, num_heads=2, dim=32),
        upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2))
    system = TransEmbSystem(
        cfg, OptimConfig(), N_SYM,
        upstream=SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32))
    rng = np.random.default_rng(1)
    B = 4
    sup = SupInfo(
        wavs=rng.normal(size=(B, 4000)).astype(np.float32),
        wav_lens=np.full((B,), 4000, np.int32),
        avg_frames=rng.integers(1, 3, (B, 8)).astype(np.int32),
        phonemes=rng.integers(1, N_SYM, (B, 8)).astype(np.int32),
        n_symbols=N_SYM)
    episode = Episode(sup=sup, qry=make_batch(rng, B))

    state = system.init_state(jax.random.PRNGKey(0), episode)
    s_ref, m_ref = jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))

    mesh = make_mesh(n_data=4, n_model=2)
    state2 = system.init_state(jax.random.PRNGKey(0), episode)
    state2 = shard_state(state2, mesh)
    fc1 = state2.frozen["upstream"]["params"]["layer_0"]["fc1"]["kernel"]
    assert fc1.sharding.shard_shape(fc1.shape)[-1] * 2 == fc1.shape[-1]
    step = make_tp_train_step(system, mesh, example_state=state2)
    s_tp, m_tp = step(state2, place_batch(episode, mesh),
                      jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m_ref["Total Loss"]), float(m_tp["Total Loss"]), rtol=1e-4)
