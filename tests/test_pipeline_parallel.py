"""Pipeline-parallel frozen upstream: exact agreement with the
single-device forward on a virtual multi-device mesh (GPipe schedule,
parallel/pipeline.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fscl_tpu.models.hubert import (
    SSLUpstream, frozen_upstream_features, pre_transformer_features,
    stack_layer_params,
)
from fscl_tpu.ops.masking import length_mask
from fscl_tpu.parallel.pipeline import pipeline_upstream_features


def _mesh(n, name="model"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]), (name,))


def _upstream_and_inputs(n_layers=4, B=4):
    up = SSLUpstream(dim=16, n_layers=n_layers, n_heads=2, ffn_dim=32)
    rng = np.random.default_rng(0)
    wavs = (rng.normal(size=(B, 8000)).astype(np.float32) * 0.3).clip(-1, 1)
    wav_lens = np.array([8000, 5000, 8000, 3000][:B], np.int32)
    valid = length_mask(jnp.asarray(wav_lens), wavs.shape[-1])
    params = up.init(jax.random.PRNGKey(0), jnp.asarray(wavs))
    return up, params, jnp.asarray(wavs), valid


def test_pre_transformer_matches_monolith():
    """pre_transformer_features == hidden layer 0 of the monolithic
    forward (the pure-function re-expression the pipeline builds on)."""
    up, params, wavs, valid = _upstream_and_inputs()
    hidden, fv = frozen_upstream_features(up, params, wavs, valid)
    x, fv2 = pre_transformer_features(up, params, wavs, valid)
    assert np.array_equal(np.asarray(fv), np.asarray(fv2))
    np.testing.assert_allclose(
        np.asarray(hidden[:, :, 0]), np.asarray(x), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (4, 2)])
def test_pipeline_matches_single_device(n_stages, n_micro):
    up, params, wavs, valid = _upstream_and_inputs()
    mesh = _mesh(n_stages)
    ref, fv_ref = frozen_upstream_features(up, params, wavs, valid)
    out, fv = jax.jit(
        lambda p, w, v: pipeline_upstream_features(
            up, p, w, v, mesh, n_micro=n_micro)
    )(params, wavs, valid)
    assert np.array_equal(np.asarray(fv_ref), np.asarray(fv))
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_accepts_scanned_layout_and_int16():
    """Scanned {layers} param layout and int16 PCM wavs both flow through
    the same contract as frozen_upstream_features."""
    up, params, wavs, valid = _upstream_and_inputs()
    mesh = _mesh(2)
    stacked = {"params": stack_layer_params(params["params"], up.n_layers)}
    wavs_i16 = jnp.asarray(np.clip(
        np.rint(np.asarray(wavs) * 32768.0), -32768, 32767).astype(np.int16))
    ref, _ = frozen_upstream_features(up, params, wavs, valid)
    out, _ = jax.jit(
        lambda p, w, v: pipeline_upstream_features(up, p, w, v, mesh)
    )(stacked, wavs_i16, valid)
    scale = float(np.abs(np.asarray(ref)).max())
    assert float(np.abs(np.asarray(out) - np.asarray(ref)).max()) \
        < 2e-3 * scale


def test_pipeline_rejects_bad_split():
    up, params, wavs, valid = _upstream_and_inputs(n_layers=3)
    mesh = _mesh(2)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_upstream_features(up, params, wavs, valid, mesh)


@pytest.mark.parametrize("mode", ["pp", "sp"])
def test_fscl_episode_with_parallel_upstream(mode):
    """attach_parallel_upstream: a full FSCL episode train step with the
    pipeline-/sequence-parallel upstream produces the same loss and the
    same parameter update as the monolithic forward."""
    import jax

    from fscl_tpu.core.config import (
        CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
        TransformerConfig, UpstreamConfig,
    )
    from fscl_tpu.data.batch import Batch, SupInfo
    from fscl_tpu.parallel.pipeline import attach_parallel_upstream
    from fscl_tpu.systems.fscl import Episode, TransEmbSystem

    mesh = _mesh(2)
    n_sym = 12
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32, encoder_dropout=0.0,
            decoder_dropout=0.0),
        codebook=CodebookConfig(size=4, num_heads=2, dim=32),
        # UpstreamConfig.n_layers counts the conv output; 3 -> 2
        # transformer layers, divisible by the 2 pipeline stages
        upstream=UpstreamConfig(name="tiny", dim=16, n_layers=3),
        max_seq_len=32, speaker=SpeakerConfig(n_speakers=4))
    system = TransEmbSystem(cfg, OptimConfig(), n_sym)

    rng = np.random.default_rng(7)
    S, B, L, T, W = 2, 2, 8, 24, 8000
    dur = rng.integers(1, 3, (B, L)).astype(np.int32)
    episode = Episode(
        sup=SupInfo(
            wavs=(rng.normal(size=(S, W)).astype(np.float32) * 0.2),
            wav_lens=np.array([W, W // 2], np.int32),
            avg_frames=rng.integers(1, 4, (S, L)).astype(np.int32),
            phonemes=rng.integers(1, n_sym, (S, L)).astype(np.int32),
            n_symbols=n_sym),
        qry=Batch(
            speaker_args=np.zeros(B, np.int32),
            texts=rng.integers(1, n_sym, (B, L)).astype(np.int32),
            src_lens=np.full((B,), L, np.int32),
            mels=rng.normal(size=(B, T, 80)).astype(np.float32),
            mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
            pitches=rng.normal(size=(B, L)).astype(np.float32),
            energies=rng.normal(size=(B, L)).astype(np.float32),
            durations=dur, lang_ids=np.zeros(B, np.int32)))

    state = system.init_state(jax.random.PRNGKey(0), episode)
    s_ref, m_ref = jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))

    attach_parallel_upstream(system, mode, mesh)
    s_par, m_par = jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_par["Total Loss"]),
                               float(m_ref["Total Loss"]),
                               rtol=1e-4, atol=1e-5)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        s_ref.params, s_par.params)
    assert max(jax.tree_util.tree_leaves(deltas)) < 1e-4

    attach_parallel_upstream(system, "none", mesh)
    assert system.upstream_forward is None
    with pytest.raises(ValueError, match="unknown upstream parallel"):
        attach_parallel_upstream(system, "bogus", mesh)


def test_dp_x_pp_composition():
    """DP over the data axis x pipelined upstream over the model axis, in
    ONE train step (the realistic episodic-meta-training deployment):
    batch-sharded pjit outer program, GPipe shard_map inner program, loss
    equal to the single-device step."""
    import jax

    from fscl_tpu.core.config import (
        CodebookConfig, ModelConfig, OptimConfig, SpeakerConfig,
        TransformerConfig, UpstreamConfig,
    )
    from fscl_tpu.data.batch import Batch, SupInfo
    from fscl_tpu.parallel.mesh import make_mesh, replicate
    from fscl_tpu.parallel.pipeline import attach_parallel_upstream
    from fscl_tpu.systems.fscl import Episode, TransEmbSystem
    from fscl_tpu.train.trainer import make_parallel_train_step, place_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n_sym = 12
    cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32, encoder_dropout=0.0,
            decoder_dropout=0.0),
        codebook=CodebookConfig(size=4, num_heads=2, dim=32),
        # 5 -> 4 transformer layers, divisible by the 4 pipeline stages
        upstream=UpstreamConfig(name="tiny", dim=16, n_layers=5),
        max_seq_len=32, speaker=SpeakerConfig(n_speakers=4))
    system = TransEmbSystem(cfg, OptimConfig(), n_sym)

    rng = np.random.default_rng(9)
    S, B, L, T, W = 4, 2, 8, 24, 8000
    dur = rng.integers(1, 3, (B, L)).astype(np.int32)
    episode = Episode(
        sup=SupInfo(
            wavs=(rng.normal(size=(S, W)).astype(np.float32) * 0.2),
            wav_lens=np.full((S,), W, np.int32),
            avg_frames=rng.integers(1, 4, (S, L)).astype(np.int32),
            phonemes=rng.integers(1, n_sym, (S, L)).astype(np.int32),
            n_symbols=n_sym),
        qry=Batch(
            speaker_args=np.zeros(B, np.int32),
            texts=rng.integers(1, n_sym, (B, L)).astype(np.int32),
            src_lens=np.full((B,), L, np.int32),
            mels=rng.normal(size=(B, T, 80)).astype(np.float32),
            mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
            pitches=rng.normal(size=(B, L)).astype(np.float32),
            energies=rng.normal(size=(B, L)).astype(np.float32),
            durations=dur, lang_ids=np.zeros(B, np.int32)))

    state = system.init_state(jax.random.PRNGKey(0), episode)
    ref = float(jax.jit(system.train_step)(
        state, episode, jax.random.PRNGKey(1))[1]["Total Loss"])

    mesh = make_mesh(n_data=2, n_model=4)
    attach_parallel_upstream(system, "pp", mesh, n_micro=2)
    st = replicate(state, mesh)
    step = make_parallel_train_step(system, mesh)
    st2, metrics = step(st, place_batch(episode, mesh),
                        jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["Total Loss"]), ref,
                               rtol=1e-4, atol=1e-5)
