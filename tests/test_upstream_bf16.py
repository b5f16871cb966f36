"""UpstreamConfig.compute_dtype="bfloat16" — the frozen forward-only SSL
upstream runs in bf16 (measured 1.57x on full-size FSCL episodes) while the
stop-gradient boundary returns f32 hidden states, so everything downstream
is unchanged in dtype and close in value."""
import numpy as np


def test_bf16_upstream_features_close_to_f32():
    import jax
    import jax.numpy as jnp

    from fscl_tpu.models.hubert import SSLUpstream, frozen_upstream_features

    up = SSLUpstream(dim=64, n_layers=2, n_heads=4, ffn_dim=128)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32) * 0.1)
    valid = jnp.ones((2, 4000), bool)
    params = up.init(jax.random.PRNGKey(0), wavs, valid)

    h32, v32 = frozen_upstream_features(up, params, wavs, valid, "float32")
    h16, v16 = frozen_upstream_features(up, params, wavs, valid, "bfloat16")
    assert h16.dtype == jnp.float32          # cast back at the boundary
    assert bool(jnp.all(v16 == v32))
    denom = np.maximum(np.abs(np.asarray(h32)), 1e-3)
    rel = np.abs(np.asarray(h16) - np.asarray(h32)) / denom
    assert float(np.median(rel)) < 2e-2, float(np.median(rel))


def test_bf16_episode_step_runs_and_matches_loss():
    import jax

    from fscl_tpu.core.config import (
        CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
        TransformerConfig, UpstreamConfig,
    )
    from fscl_tpu.systems.fscl import TransEmbSystem
    from tests.test_frozen_threading import _episode

    def build(dtype):
        cfg = ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, decoder_layer=1, encoder_hidden=32,
                decoder_hidden=32, conv_filter_size=32),
            speaker=SpeakerConfig(n_speakers=4), max_seq_len=64,
            codebook=CodebookConfig(size=4, num_heads=2, dim=32),
            upstream=UpstreamConfig(name="tiny", dim=32, n_layers=2,
                                    compute_dtype=dtype))
        system = TransEmbSystem(cfg, OptimConfig(), 40)
        episode = _episode()
        state = system.init_state(jax.random.PRNGKey(0), episode)
        _, metrics = jax.jit(system.train_step)(
            state, episode, jax.random.PRNGKey(1))
        return float(metrics["Total Loss"])

    l32 = build("float32")
    l16 = build("bfloat16")
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05, (l16, l32)
