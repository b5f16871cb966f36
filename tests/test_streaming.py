"""Chunked streaming vocode == full-utterance vocode (clamped halo windows).

T=56 > window=40 exercises real windowing: edge-clamped first/last
windows plus interior centered windows. Equality is vs the full vocode of
the right-padded mel (the streaming contract; a bucketed serving mel is
padding beyond mel_len anyway).
"""
import numpy as np

import jax
import jax.numpy as jnp

from fscl_tpu.models.hifigan import HiFiGANGenerator
from fscl_tpu.audio_out.streaming import chunked_vocode


def _gen_and_mel(T, B=1, seed=0):
    gen = HiFiGANGenerator(n_mels=80)
    v = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    return gen, v, mel


def test_chunked_equals_full():
    gen, v, mel = _gen_and_mel(T=56)
    full = np.asarray(gen.apply(v, mel))
    parts = list(chunked_vocode(gen, v, mel, chunk=8, fused=False))
    assert [s for s, _ in parts] == [i * 8 * 256 for i in range(7)]
    wav = np.concatenate([w for _, w in parts], axis=1)
    assert wav.shape == full.shape
    np.testing.assert_allclose(wav, full, atol=2e-5)


def test_chunked_fused_path_close():
    # fused serving ops inside the chunk window (reassociation-level diff)
    gen, v, mel = _gen_and_mel(T=56, seed=3)
    full = np.asarray(gen.apply(v, mel))
    parts = list(chunked_vocode(gen, v, mel, chunk=8, fused=True))
    wav = np.concatenate([w for _, w in parts], axis=1)
    err = np.abs(wav - full)
    assert err.mean() < 1e-4 and err.max() < 2e-2


def test_chunk_not_dividing_T():
    # contract: equals the full vocode of the right-padded mel
    gen, v, mel = _gen_and_mel(T=53, seed=5)
    full_padded = np.asarray(gen.apply(
        v, jnp.pad(mel, ((0, 0), (0, 3), (0, 0)))))
    parts = list(chunked_vocode(gen, v, mel, chunk=8, fused=False))
    wav = np.concatenate([w for _, w in parts], axis=1)
    assert wav.shape[1] == 56 * 256
    np.testing.assert_allclose(wav, full_padded, atol=2e-5)


def test_short_utterance_single_window():
    gen, v, mel = _gen_and_mel(T=16, seed=7)
    full = np.asarray(gen.apply(v, mel))
    parts = list(chunked_vocode(gen, v, mel, chunk=8, fused=False))
    wav = np.concatenate([w for _, w in parts], axis=1)
    np.testing.assert_allclose(wav, full, atol=2e-5)


def test_generator_halo_and_hop_derived():
    from fscl_tpu.audio_out.streaming import generator_halo, generator_hop
    gen = HiFiGANGenerator()
    # V1 analytic receptive field ~13.3 frames (+1 margin = 15); the
    # perturbation-measured value is +-12.5
    assert 14 <= generator_halo(gen) <= 16
    assert generator_hop(gen) == 256
    small = HiFiGANGenerator(upsample_rates=(4, 4),
                             upsample_kernel_sizes=(8, 8))
    assert generator_hop(small) == 16
    # stage-0 MRF reach is 60 samples at rate 4 = 15 frames > the V1 halo
    assert generator_halo(small) > 16

    class NoCfg:
        pass
    from fscl_tpu.audio_out.streaming import DEFAULT_HALO
    assert generator_halo(NoCfg()) == DEFAULT_HALO
    assert generator_hop(NoCfg()) is None


def test_chunked_small_hop_generator():
    # non-256-hop config: hop (16) and halo are derived from the module,
    # so chunk slicing and start_sample accounting stay exact
    gen = HiFiGANGenerator(n_mels=16, upsample_rates=(4, 4),
                           upsample_kernel_sizes=(8, 8),
                           upsample_initial_channel=32,
                           resblock_kernel_sizes=(3,),
                           resblock_dilations=((1, 3),))
    v = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 16)))
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.normal(size=(1, 56, 16)).astype(np.float32))
    full = np.asarray(gen.apply(v, mel))
    parts = list(chunked_vocode(gen, v, mel, chunk=8, fused=False))
    assert [s for s, _ in parts] == [i * 8 * 16 for i in range(7)]
    wav = np.concatenate([w for _, w in parts], axis=1)
    assert wav.shape == full.shape
    np.testing.assert_allclose(wav, full, atol=2e-5)


def test_vocoder_fused_optout_matches_module_apply():
    from fscl_tpu.audio_out.vocoder import Vocoder
    gen, v, mel = _gen_and_mel(T=12, seed=9)
    ref = np.asarray(gen.apply(v, mel))[0]
    voc = Vocoder(gen, v, fused=False)
    # jit-vs-eager fusion reassociation only (~2e-7), NOT the fused-path
    # divergence class (~1e-4 mean)
    np.testing.assert_allclose(voc.infer(np.asarray(mel[0])), ref, atol=1e-6)
