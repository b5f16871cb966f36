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
