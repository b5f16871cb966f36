"""FastSpeech2 model tests: shapes, masking invariants, loss, grad flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fscl_tpu.core.config import ModelConfig, SpeakerConfig, TransformerConfig
from fscl_tpu.core.stats import DEFAULT_STATS
from fscl_tpu.models.fastspeech2 import FastSpeech2
from fscl_tpu.nn.losses import fastspeech2_loss
from fscl_tpu.ops.masking import length_mask

CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=2, decoder_layer=2, encoder_hidden=64, decoder_hidden=64,
        conv_filter_size=128, encoder_head=2, decoder_head=2,
    ),
    max_seq_len=64,
    speaker=SpeakerConfig(emb_type="table", n_speakers=4),
)

B, L, T = 2, 12, 48
D = CFG.transformer.encoder_hidden


def make_batch(rng):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    emb = jax.random.normal(k1, (B, L, D))
    src_lens = jnp.array([12, 8])
    dur = jax.random.randint(k2, (B, L), 1, 4)
    dur = jnp.where(length_mask(src_lens, L), dur, 0)
    mel_lens = jnp.minimum(jnp.sum(dur, -1), T)
    pitch = jax.random.normal(k3, (B, L))
    energy = jax.random.normal(k4, (B, L))
    mel_target = jax.random.normal(k1, (B, T, 80))
    return emb, src_lens, dur, mel_lens, pitch, energy, mel_target


@pytest.fixture(scope="module")
def model_and_params():
    model = FastSpeech2(CFG, DEFAULT_STATS)
    rng = jax.random.PRNGKey(0)
    emb, src_lens, dur, mel_lens, pitch, energy, _ = make_batch(rng)
    variables = model.init(
        rng, emb, src_lens, T, speaker_args=jnp.array([0, 0]),
        mel_lens=mel_lens, p_targets=pitch, e_targets=energy, d_targets=dur,
        lang_args=jnp.array([0, 1]),
    )
    return model, variables


def test_forward_shapes(model_and_params):
    model, variables = model_and_params
    rng = jax.random.PRNGKey(0)
    emb, src_lens, dur, mel_lens, pitch, energy, _ = make_batch(rng)
    out = model.apply(
        variables, emb, src_lens, T, speaker_args=jnp.array([0, 0]),
        mel_lens=mel_lens, p_targets=pitch, e_targets=energy, d_targets=dur,
        lang_args=jnp.array([0, 1]),
    )
    assert out.mel.shape == (B, T, 80)
    assert out.postnet_mel.shape == (B, T, 80)
    assert out.pitch_prediction.shape == (B, L)
    assert out.log_duration_prediction.shape == (B, L)
    assert not bool(jnp.any(jnp.isnan(out.postnet_mel)))


def test_inference_no_targets(model_and_params):
    model, variables = model_and_params
    rng = jax.random.PRNGKey(1)
    emb, src_lens, *_ = make_batch(rng)
    out = model.apply(
        variables, emb, src_lens, T, speaker_args=jnp.array([0, 0]),
        lang_args=jnp.array([0, 0]),
    )
    assert out.mel.shape == (B, T, 80)
    assert out.duration_rounded.dtype == jnp.int32
    # durations at padded positions must be zero
    pad_dur = jnp.where(length_mask(out.src_len, L), 0, out.duration_rounded)
    assert int(jnp.sum(pad_dur)) == 0


def test_loss_and_grads(model_and_params):
    model, variables = model_and_params
    rng = jax.random.PRNGKey(2)
    emb, src_lens, dur, mel_lens, pitch, energy, mel_target = make_batch(rng)

    def loss_fn(params):
        out = model.apply(
            {**variables, "params": params}, emb, src_lens, T,
            speaker_args=jnp.array([0, 0]), mel_lens=mel_lens,
            p_targets=pitch, e_targets=energy, d_targets=dur,
            lang_args=jnp.array([0, 1]),
        )
        losses = fastspeech2_loss(
            out.mel, out.postnet_mel, out.pitch_prediction,
            out.energy_prediction, out.log_duration_prediction,
            mel_target, pitch, energy, dur, out.src_valid, out.mel_valid,
        )
        return losses.total

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    total_norm = sum(float(jnp.sum(g ** 2)) for g in flat)
    assert total_norm > 0


def test_average_spk_emb(model_and_params):
    model, variables = model_and_params
    rng = jax.random.PRNGKey(3)
    emb, src_lens, *_ = make_batch(rng)
    out = model.apply(
        variables, emb, src_lens, T, speaker_args=jnp.array([0, 1]),
        lang_args=jnp.array([0, 0]), average_spk_emb=True,
    )
    assert out.mel.shape == (B, T, 80)
