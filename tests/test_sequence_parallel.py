"""Sequence-parallel frozen upstream: exact agreement with the
single-device forward on a virtual multi-device mesh (gathered-KV
schedule, parallel/sequence_parallel.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fscl_tpu.models.hubert import SSLUpstream, frozen_upstream_features
from fscl_tpu.ops.masking import length_mask
from fscl_tpu.parallel.sequence_parallel import (
    sequence_parallel_upstream_features,
)


def _mesh(n, name="model"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]), (name,))


def _upstream_and_inputs(n_layers=3, B=2, W=8000, layer_norm_first=True):
    up = SSLUpstream(dim=16, n_layers=n_layers, n_heads=2, ffn_dim=32,
                     layer_norm_first=layer_norm_first)
    rng = np.random.default_rng(1)
    wavs = (rng.normal(size=(B, W)).astype(np.float32) * 0.3).clip(-1, 1)
    wav_lens = np.array([W, W // 2][:B], np.int32)
    valid = length_mask(jnp.asarray(wav_lens), wavs.shape[-1])
    params = up.init(jax.random.PRNGKey(0), jnp.asarray(wavs))
    return up, params, jnp.asarray(wavs), valid


@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("layer_norm_first", [True, False])
def test_sp_matches_single_device(n_shards, layer_norm_first):
    """T' = 24 frames at W=8000: divisible by 2, NOT by 4 — the 4-shard
    case also exercises the invalid-frame padding path."""
    up, params, wavs, valid = _upstream_and_inputs(
        layer_norm_first=layer_norm_first)
    mesh = _mesh(n_shards)
    ref, fv_ref = frozen_upstream_features(up, params, wavs, valid)
    out, fv = jax.jit(
        lambda p, w, v: sequence_parallel_upstream_features(
            up, p, w, v, mesh)
    )(params, wavs, valid)
    assert np.array_equal(np.asarray(fv_ref), np.asarray(fv))
    assert out.shape == ref.shape
    # padded/invalid frames produce garbage locally and are masked out of
    # every key — compare only the valid frames
    m = np.asarray(fv_ref)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=2e-4, atol=2e-4)


def test_sp_int16_wire():
    up, params, wavs, valid = _upstream_and_inputs()
    mesh = _mesh(2)
    wavs_i16 = jnp.asarray(np.clip(
        np.rint(np.asarray(wavs) * 32768.0), -32768, 32767).astype(np.int16))
    ref, _ = frozen_upstream_features(up, params, wavs, valid)
    out, fv = jax.jit(
        lambda p, w, v: sequence_parallel_upstream_features(
            up, p, w, v, mesh)
    )(params, wavs_i16, valid)
    m = np.asarray(fv)[:, :, None, None]
    scale = float(np.abs(np.asarray(ref)).max())
    assert float(np.abs((np.asarray(out) - np.asarray(ref)) * m).max()) \
        < 2e-3 * scale


def test_sp_and_pp_bf16_match_monolithic_bf16():
    """compute_dtype="bfloat16" through the parallel schedules matches the
    monolithic bf16 forward (same casts, same stop-gradient boundary)."""
    from fscl_tpu.parallel.pipeline import pipeline_upstream_features

    up, params, wavs, valid = _upstream_and_inputs(n_layers=4)
    mesh = _mesh(2)
    ref, fv = frozen_upstream_features(up, params, wavs, valid, "bfloat16")
    m = np.asarray(fv)[:, :, None, None]
    scale = float(np.abs(np.asarray(ref)).max())
    for fn in (pipeline_upstream_features,
               sequence_parallel_upstream_features):
        out, _ = jax.jit(
            lambda p, w, v, fn=fn: fn(up, p, w, v, mesh,
                                      compute_dtype="bfloat16")
        )(params, wavs, valid)
        err = float(np.abs((np.asarray(out) - np.asarray(ref)) * m).max())
        # bf16 accumulation orders differ across the schedules; bound by
        # a few bf16 ulps of the output scale
        assert err < 3e-2 * scale, (fn.__name__, err, scale)
