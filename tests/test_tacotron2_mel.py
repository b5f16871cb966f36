"""Full mel Tacotron2 tests."""
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

CFG = Tacotron2Config(
    n_mels=8, n_frames_per_step=2, symbols_embedding_dim=16,
    encoder_embedding_dim=32, prenet_dim=16, attention_rnn_dim=32,
    decoder_rnn_dim=32, attention_dim=16, attention_location_n_filters=4,
    attention_location_kernel_size=7)

B, L, T = 2, 5, 8


def test_teacher_forced_and_infer():
    model = Tacotron2(CFG)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (B, L, CFG.symbols_embedding_dim))
    src_lens = jnp.array([L, L - 1])
    mels = jax.random.normal(rng, (B, T, CFG.n_mels))
    variables = model.init(rng, emb, src_lens, mels, rng)
    mel, postnet_mel, gates, aligns = model.apply(
        variables, emb, src_lens, mels, jax.random.PRNGKey(1))
    assert mel.shape == (B, T, CFG.n_mels)
    assert postnet_mel.shape == (B, T, CFG.n_mels)
    assert gates.shape == (B, T // CFG.n_frames_per_step)
    assert aligns.shape == (B, T // CFG.n_frames_per_step, L)
    np.testing.assert_allclose(np.asarray(aligns.sum(-1)), 1.0, atol=1e-5)

    mel_i, post_i, n_frames, aligns_i = model.apply(
        variables, emb, src_lens, jax.random.PRNGKey(2), 6,
        method=Tacotron2.infer)
    assert mel_i.shape == (B, 12, CFG.n_mels)
    assert (np.asarray(n_frames) <= 12).all()
