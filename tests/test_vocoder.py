"""HiFi-GAN generator + Griffin-Lim tests."""
import numpy as np
import pytest


def test_hifigan_upsampling_factor():
    import jax
    from fscl_tpu.models.hifigan import HiFiGANGenerator
    # tiny config, same 256x total upsampling
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 80))
    variables = gen.init(jax.random.PRNGKey(1), mel)
    wav = gen.apply(variables, mel)
    assert wav.shape == (1, 20 * 256)
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_hifigan_torch_converter_shapes():
    import torch
    from fscl_tpu.models.hifigan import (
        HiFiGANGenerator, convert_torch_checkpoint,
    )

    # synthesize a weight-normed generator state dict with official key names
    ch0 = 32
    rates = [8, 8, 2, 2]
    ks = [16, 16, 4, 4]
    sd = {}

    def wn(prefix, out_c, in_c, k):
        w = torch.randn(out_c, in_c, k)
        sd[f"{prefix}.weight_g"] = w.norm(dim=(1, 2), keepdim=True)
        sd[f"{prefix}.weight_v"] = w
        sd[f"{prefix}.bias"] = torch.randn(out_c)

    wn("conv_pre", ch0, 80, 7)
    for i, (r, k) in enumerate(zip(rates, ks)):
        in_c, out_c = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
        # ConvTranspose1d weight is (in, out, k)
        w = torch.randn(in_c, out_c, k)
        sd[f"ups.{i}.weight_g"] = w.norm(dim=(1, 2), keepdim=True)
        sd[f"ups.{i}.weight_v"] = w
        sd[f"ups.{i}.bias"] = torch.randn(out_c)
        for j in range(3):
            ridx = i * 3 + j
            rk = [3, 7, 11][j]
            for c in range(3):
                wn(f"resblocks.{ridx}.convs1.{c}", out_c, out_c, rk)
                wn(f"resblocks.{ridx}.convs2.{c}", out_c, out_c, rk)
    wn("conv_post", 1, ch0 // 16, 7)

    variables = convert_torch_checkpoint(sd)
    gen = HiFiGANGenerator(upsample_initial_channel=ch0)
    import jax
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 80))
    wav = gen.apply(variables, mel)
    assert wav.shape == (1, 2560)
    assert np.isfinite(np.asarray(wav)).all()


def test_subpixel_upsample_matches_conv_transpose():
    """SubpixelUpsample must be numerically equal to nn.ConvTranspose on the
    SAME params (identical layout), for both (k=16, r=8) and (k=4, r=2)."""
    import flax.linen as nn
    import jax
    from fscl_tpu.models.hifigan import SubpixelUpsample

    rng = jax.random.PRNGKey(0)
    for (k, r, in_ch, out_ch, t) in ((16, 8, 12, 6, 17), (4, 2, 6, 3, 33)):
        x = jax.random.normal(jax.random.fold_in(rng, k), (2, t, in_ch))
        sub = SubpixelUpsample(out_ch, k, r)
        variables = sub.init(jax.random.fold_in(rng, r), x)
        ct = nn.ConvTranspose(out_ch, (k,), strides=(r,), padding="SAME",
                              transpose_kernel=True)
        want = ct.apply(variables, x)
        got = sub.apply(variables, x)
        assert got.shape == want.shape == (2, t * r, out_ch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


def test_hifigan_subpixel_impl_matches_default():
    """Whole-generator equality: the subpixel impl applied to the SAME
    variables produces the same waveform as the conv_transpose impl."""
    import jax
    from fscl_tpu.models.hifigan import HiFiGANGenerator

    gen = HiFiGANGenerator(upsample_initial_channel=32)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 80))
    variables = gen.init(jax.random.PRNGKey(1), mel)
    want = gen.apply(variables, mel)
    got = HiFiGANGenerator(upsample_initial_channel=32,
                           upsample_impl="subpixel").apply(variables, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_griffin_lim_roundtrip_shape():
    from fscl_tpu.audio_out.vocoder import griffin_lim
    import jax.numpy as jnp
    from fscl_tpu.ops.stft import mel_spectrogram
    sr = 22050
    t = np.arange(sr // 2) / sr
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mel, _ = mel_spectrogram(jnp.asarray(wav))
    out = griffin_lim(np.asarray(mel), n_iter=4)
    assert len(out) == mel.shape[0] * 256
    assert np.abs(out).max() <= 1.0
