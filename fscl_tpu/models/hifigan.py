"""HiFi-GAN generator (vocoder) in flax.

TPU-native equivalent of the torch HiFi-GAN the reference consumes through
dlhlp_lib.vocoders (lightning/callbacks/language/baseline_saver.py:44-45,
lightning/utils/tool.py:20-42): mel (B, T, 80) -> waveform (B, T*256).
Architecture is the public HiFi-GAN V1 (transposed convs + multi-receptive-
field fusion ResBlocks); `convert_torch_checkpoint` maps the official
generator checkpoints so the same vocoder weights the reference uses work
here (BASELINE.md quality-parity requirement).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: object = None     # computation dtype; params stay f32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = _leaky(x)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        dtype=self.dtype, name=f"convs1_{i}")(h)
            h = _leaky(h)
            h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"convs2_{i}")(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    """V1 config: 512 base channels, upsample rates (8,8,2,2) -> 256x hop."""
    n_mels: int = 80
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    # computation dtype for the convs (params/outputs stay f32).
    # bfloat16 roughly doubles serving throughput on TPU; measured waveform
    # divergence vs f32 is ~1e-3 on a tanh-bounded signal
    # (benchmarks/bench_e2e_tts.py --dtype A/B).
    dtype: object = None

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, n_mels) log-mel -> wav (B, T * prod(rates))."""
        x = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME",
                    dtype=self.dtype, name="conv_pre")(mel)
        for i, (r, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            x = _leaky(x)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            # SAME == torch ConvTranspose1d(padding=(k-r)//2): exact output
            # length in*r and bit-identical values (verified vs torch)
            x = nn.ConvTranspose(ch, (k,), strides=(r,), padding="SAME",
                                 transpose_kernel=True, dtype=self.dtype,
                                 name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                h = ResBlock1(ch, rk, rd, dtype=self.dtype,
                              name=f"resblock_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        x = _leaky(x)
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


def convert_torch_checkpoint(state_dict) -> dict:
    """Map an official HiFi-GAN generator state_dict (weight-norm convs) to
    this module's params."""
    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    def wn(prefix):
        g = t(state_dict[f"{prefix}.weight_g"])
        v = t(state_dict[f"{prefix}.weight_v"])
        w = g * v / np.linalg.norm(v.reshape(v.shape[0], -1),
                                   axis=1).reshape(-1, 1, 1)
        return w, t(state_dict[f"{prefix}.bias"])

    p = {}
    w, b = wn("conv_pre")
    p["conv_pre"] = {"kernel": w.transpose(2, 1, 0), "bias": b}
    n_ups = len([k for k in state_dict if k.startswith("ups.") and k.endswith("weight_g")])
    n_res_per = 3
    for i in range(n_ups):
        w, b = wn(f"ups.{i}")
        # torch ConvTranspose1d weight: (in, out, k) -> flax transpose_kernel
        # expects (k, out, in)
        p[f"ups_{i}"] = {"kernel": w.transpose(2, 1, 0), "bias": b}
        for j in range(n_res_per):
            ridx = i * n_res_per + j
            rb = {}
            for c in range(3):
                w1, b1 = wn(f"resblocks.{ridx}.convs1.{c}")
                w2, b2 = wn(f"resblocks.{ridx}.convs2.{c}")
                rb[f"convs1_{c}"] = {"kernel": w1.transpose(2, 1, 0), "bias": b1}
                rb[f"convs2_{c}"] = {"kernel": w2.transpose(2, 1, 0), "bias": b2}
            p[f"resblock_{i}_{j}"] = rb
    w, b = wn("conv_post")
    p["conv_post"] = {"kernel": w.transpose(2, 1, 0), "bias": b}
    return {"params": p}
