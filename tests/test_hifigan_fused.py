"""MXU-dense HiFiGAN serving ops vs the flax module.

`fused_generator_apply` (the serving path) is pure XLA: conv_pre as an
unfolded matmul, narrow MRF stages sample-packed, conv_post as a packed
strided conv. The Pallas `fused_mrf_stage` kernel is kept as a measured
ablation (it lost to the packed form on-chip: VPU roll traffic at narrow
C) and stays semantics-pinned here in interpret mode.

Tolerances: the f64 comparisons are the proof of equivalence (fp
reassociation vanishes at f64). At f32 a borderline leaky-relu input can
flip sign under reassociation and propagate a ~1e-4-amplitude band one
receptive field wide (observed, benign), hence the mean/max bounds.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from fscl_tpu.models.hifigan import HiFiGANGenerator, ResBlock1
from fscl_tpu.ops.hifigan_fused import (conv_post_packed, conv_pre_matmul,
                                        fused_generator_apply,
                                        fused_mrf_stage,
                                        packed_resblock_stage)

KS, DS = (3, 7, 11), ((1, 3, 5),) * 3


def _stage_ref(x, res_p, dtype=None):
    out = sum(ResBlock1(x.shape[-1], k, DS[j], dtype=dtype).apply(
        {"params": res_p[j]}, x) for j, k in enumerate(KS))
    return out / len(KS)


def _make_res_params(C, key=0, dtype=None):
    rng = np.random.default_rng(key)
    x0 = jnp.asarray(rng.normal(size=(1, 64, C)).astype(np.float32))
    ps = [ResBlock1(C, k, DS[j]).init(jax.random.PRNGKey(key + j), x0)
          ["params"] for j, k in enumerate(KS)]
    if dtype is not None:
        ps = [jax.tree.map(lambda a: a.astype(dtype), p) for p in ps]
    return ps


@pytest.mark.parametrize("C,P", [(32, 4), (64, 2)])
def test_packed_stage_matches_resblocks_f64(C, P):
    with jax.enable_x64(True):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 256, C)))
        assert x.dtype == jnp.float64
        res_p = _make_res_params(C, dtype=jnp.float64)
        ref = _stage_ref(x, res_p)
        got = packed_resblock_stage(x, res_p, KS, DS, P=P,
                                    compute_dtype=jnp.float64)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)


def test_packed_stage_f32_close():
    C, P = 32, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 256, C)).astype(np.float32))
    res_p = _make_res_params(C, key=5)
    ref = _stage_ref(x, res_p)
    got = packed_resblock_stage(x, res_p, KS, DS, P=P,
                                compute_dtype=jnp.float32)
    err = np.abs(np.asarray(ref) - np.asarray(got))
    assert err.mean() < 1e-5 and err.max() < 5e-3


def test_packed_stage_rejects_unaligned_T():
    res_p = _make_res_params(32)
    with pytest.raises(ValueError):
        packed_resblock_stage(jnp.zeros((1, 255, 32)), res_p, KS, DS, P=4)


@pytest.mark.parametrize("C,T,tile", [(32, 300, 128), (128, 200, 128)])
def test_pallas_stage_matches_resblocks_f64(C, T, tile):
    # ablation kernel: covers both paths — unfold (C<128) and per-tap
    # (C=128) — plus non-tile-multiple T (pad + t_orig masking)
    with jax.enable_x64(True):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, T, C)))
        res_p = _make_res_params(C, dtype=jnp.float64)
        ref = _stage_ref(x, res_p)
        got = fused_mrf_stage(x, res_p, KS, DS, compute_dtype=jnp.float64,
                              tile=tile, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-7)


def test_pallas_stage_tile_invariant():
    C, T = 32, 300
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, T, C)).astype(np.float32))
    res_p = _make_res_params(C, key=5)
    got128 = fused_mrf_stage(x, res_p, KS, DS, compute_dtype=jnp.float32,
                             tile=128, interpret=True)
    got384 = fused_mrf_stage(x, res_p, KS, DS, compute_dtype=jnp.float32,
                             tile=384, interpret=True)
    # tiling must not change values at all (halo recompute is exact)
    np.testing.assert_array_equal(np.asarray(got128), np.asarray(got384))


def test_conv_pre_matmul_exact():
    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.normal(size=(2, 50, 80)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, 80, 512)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.normal(size=(512,)).astype(np.float32))
    ref = nn.Conv(512, (7,), padding="SAME").apply(
        {"params": {"kernel": k, "bias": b}}, mel)
    got = conv_pre_matmul(mel, k, b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("T", [256, 300])  # packed path and odd-T fallback
def test_conv_post_packed(T):
    C = 32
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=(2, T, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, C, 1)), jnp.float32) * 0.1
    b = jnp.asarray(rng.normal(size=(1,)), jnp.float32)
    ref = jnp.tanh(nn.Conv(1, (7,), padding="SAME").apply(
        {"params": {"kernel": k, "bias": b}},
        nn.leaky_relu(y, 0.1)).astype(jnp.float32))[..., 0]
    got = conv_post_packed(y, k, b, compute_dtype=jnp.float32)
    assert got.shape == ref.shape and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_full_generator_fused_matches_module():
    gen = HiFiGANGenerator(n_mels=80)
    v = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.normal(size=(2, 8, 80)).astype(np.float32))
    ref = gen.apply(v, mel)
    got = fused_generator_apply(gen, v, mel)
    assert got.shape == ref.shape == (2, 8 * 256)
    err = np.abs(np.asarray(ref) - np.asarray(got))
    assert err.mean() < 1e-4 and err.max() < 2e-2


def test_full_generator_fused_under_jit_and_odd_T():
    # odd T_mel: the packed stages stay aligned (T is always a multiple of
    # the upsample products) but conv_post's T%128 fallback engages at
    # T_mel=9 -> T=2304
    gen = HiFiGANGenerator(n_mels=80)
    v = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.normal(size=(1, 9, 80)).astype(np.float32))
    ref = gen.apply(v, mel)
    got = jax.jit(lambda m: fused_generator_apply(gen, v, m))(mel)
    err = np.abs(np.asarray(ref) - np.asarray(got))
    assert err.mean() < 1e-4 and err.max() < 2e-2


def test_full_generator_fused_bf16_close_to_f32():
    gen32 = HiFiGANGenerator(n_mels=80)
    gen16 = HiFiGANGenerator(n_mels=80, dtype=jnp.bfloat16)
    v = gen32.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 80)))
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.normal(size=(1, 8, 80)).astype(np.float32))
    ref = gen32.apply(v, mel)
    got = fused_generator_apply(gen16, v, mel)
    assert got.dtype == jnp.float32
    # same tolerance class as the XLA bf16 vocoder path (BASELINE.md:
    # ~1e-3 mean on the [-1, 1] waveform)
    err = np.abs(np.asarray(ref) - np.asarray(got))
    assert err.mean() < 5e-3


def test_full_generator_fused_gradients_match_module_f64():
    """fused_generator_apply claims differentiability (it is pure XLA);
    pin grad parity with the module so HiFiGAN fine-tuning can ride the
    fused path (VERDICT r3 weak #6). f64 removes fp-reassociation noise;
    the leaky-relu kink is measure-zero at f64 on random inputs."""
    with jax.enable_x64(True):
        # dtype=f64 makes BOTH paths compute in f64 (gen.dtype=None means
        # f32 compute even under enable_x64, which re-introduces
        # kink-flip noise at the leaky-relus)
        gen = HiFiGANGenerator(n_mels=80, dtype=jnp.float64)
        v = HiFiGANGenerator(n_mels=80).init(jax.random.PRNGKey(3),
                                             jnp.zeros((1, 8, 80)))
        v = jax.tree.map(lambda a: a.astype(jnp.float64), v)
        rng = np.random.default_rng(11)
        mel = jnp.asarray(rng.normal(size=(1, 8, 80)))
        assert mel.dtype == jnp.float64

        # a non-trivial scalar loss touching every output sample
        tgt = jnp.asarray(rng.normal(size=(1, 8 * 256)))

        def loss_module(params, m):
            return jnp.mean((gen.apply({"params": params}, m) - tgt) ** 2)

        def loss_fused(params, m):
            return jnp.mean(
                (fused_generator_apply(gen, {"params": params}, m)
                 - tgt) ** 2)

        g_ref = jax.grad(loss_module, argnums=(0, 1))(v["params"], mel)
        g_got = jax.grad(loss_fused, argnums=(0, 1))(v["params"], mel)
        # every param leaf + the mel input gradient
        leaves_ref = jax.tree.leaves(g_ref)
        leaves_got = jax.tree.leaves(g_got)
        assert len(leaves_ref) == len(leaves_got) and leaves_ref
        for a, b in zip(leaves_ref, leaves_got):
            # measured worst per-leaf relative deviation 1.9e-7 at f64
            # (pure reassociation); a real gradient bug shows up orders
            # of magnitude above this
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a - b).max() <= 1e-6 * (np.abs(a).max() + 1e-12)
