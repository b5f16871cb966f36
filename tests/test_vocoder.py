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
