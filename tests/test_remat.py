"""Remat flag: identical outputs + gradients with rematerialization on."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import ModelConfig, SpeakerConfig, TransformerConfig
from fscl_tpu.core.stats import DEFAULT_STATS
from fscl_tpu.models.fastspeech2 import FastSpeech2

CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=2, decoder_layer=2, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=64, encoder_head=2,
        decoder_head=2),
    max_seq_len=16, speaker=SpeakerConfig(n_speakers=2))


def test_remat_matches_plain():
    rng = np.random.default_rng(0)
    B, L, T = 2, 8, 16
    emb = jnp.asarray(rng.normal(size=(B, L, 32)).astype(np.float32))
    src_lens = jnp.array([8, 6])
    dur = jnp.asarray(rng.integers(1, 3, (B, L)).astype(np.int32))
    mel_lens = jnp.minimum(dur.sum(1), T)
    pitch = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    energy = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))

    plain = FastSpeech2(CFG, DEFAULT_STATS)
    remat = FastSpeech2(dataclasses.replace(CFG, remat=True), DEFAULT_STATS)
    variables = plain.init(
        jax.random.PRNGKey(0), emb, src_lens, T,
        speaker_args=jnp.array([0, 1]), mel_lens=mel_lens,
        p_targets=pitch, e_targets=energy, d_targets=dur,
        lang_args=jnp.array([0, 0]))

    def loss(model, params):
        out = model.apply(
            {**variables, "params": params}, emb, src_lens, T,
            speaker_args=jnp.array([0, 1]), mel_lens=mel_lens,
            p_targets=pitch, e_targets=energy, d_targets=dur,
            lang_args=jnp.array([0, 0]))
        return jnp.mean((out.postnet_mel - target) ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(plain, p))(variables["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
