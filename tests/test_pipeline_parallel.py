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
