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


class SubpixelUpsample(nn.Module):
    """ConvTranspose1d(kernel k, stride r, padding (k-r)//2) computed as ONE
    stride-1 conv emitting r*out channels followed by a depth-to-space
    reshape — exactly equivalent (tests/test_vocoder.py pins allclose vs
    nn.ConvTranspose on shared params).

    Why: XLA lowers conv_transpose as a conv over a zero-dilated input
    (lhs_dilation=r), so the MXU contracts k taps of which only ~k/r are
    nonzero, and the output channel dim (256..32 down the HiFiGAN stack)
    underfills the 128-wide MXU lanes. The sub-pixel form contracts only
    the ceil(k/r)+1 real taps and widens the output dim to r*out
    (2048/256/128/64 for V1) — dense MXU work at every stage.

    Param layout (kernel (k, out, in) + bias) is IDENTICAL to
    nn.ConvTranspose(transpose_kernel=True), so converted torch checkpoints
    and existing flax checkpoints load into either implementation.
    """
    features: int
    kernel_size: int
    rate: int
    dtype: object = None     # computation dtype; params stay f32

    @nn.compact
    def __call__(self, x):
        k, r, out_ch = self.kernel_size, self.rate, self.features
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,), in_axis=-1,
                                         out_axis=-2),
            (k, out_ch, in_ch))
        bias = self.param("bias", nn.initializers.zeros, (out_ch,))

        # torch semantics (what ConvTranspose+converted ckpts implement):
        #   out[o, oc] = sum_{i,ic,kap} w[kap, oc, ic] x[i, ic],  o = i*r - pad + kap
        # Write o = r*q + p (p = sub-pixel phase). Then kap = r*delta + p + pad
        # with delta = q - i, so each phase-p output is a small conv over
        # x[q - delta] for the handful of deltas with kap in [0, k).
        pad = (k - r) // 2
        d_lo = -((r - 1 + pad) // r)
        d_hi = (k - 1 - pad) // r
        w = d_hi - d_lo + 1
        deltas = d_hi - np.arange(w)                       # window pos -> delta
        kappas = r * deltas[:, None] + np.arange(r)[None, :] + pad  # (w, r)
        valid = (kappas >= 0) & (kappas < k)
        safe = np.clip(kappas, 0, k - 1)
        dense = kernel[safe]                               # (w, r, out, in)
        dense = jnp.where(jnp.asarray(valid)[:, :, None, None], dense, 0.0)
        dense = dense.transpose(0, 3, 1, 2).reshape(w, in_ch, r * out_ch)

        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), dense.astype(dt), window_strides=(1,),
            padding=((d_hi, -d_lo),),
            dimension_numbers=("NWC", "WIO", "NWC"))
        b, t = x.shape[0], x.shape[1]
        return y.reshape(b, t * r, out_ch) + bias.astype(dt)


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
    # "subpixel" computes each upsample as a stride-1 conv + depth-to-space
    # (SubpixelUpsample) instead of conv_transpose; numerically equal, same
    # param layout, avoids the zero-dilated conv lowering.
    upsample_impl: str = "conv_transpose"

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, n_mels) log-mel -> wav (B, T * prod(rates))."""
        x = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME",
                    dtype=self.dtype, name="conv_pre")(mel)
        for i, (r, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            x = _leaky(x)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            if self.upsample_impl == "subpixel":
                x = SubpixelUpsample(ch, k, r, dtype=self.dtype,
                                     name=f"ups_{i}")(x)
            else:
                # SAME == torch ConvTranspose1d(padding=(k-r)//2): exact
                # output length in*r and bit-identical values (vs torch)
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
    this module's params. Accepts every released packaging of the same
    weights: the official training checkpoint ({"generator": sd}), flat
    state_dicts, and "generator."- / "module."- (DataParallel) prefixed
    keys; torch>=2.1 re-parametrized weight-norm keys
    (parametrizations.weight.original0/1) also convert."""
    if "generator" in state_dict and isinstance(state_dict["generator"], dict):
        state_dict = state_dict["generator"]
    for prefix in ("generator.", "module."):
        if state_dict and all(k.startswith(prefix) for k in state_dict):
            state_dict = {k[len(prefix):]: v for k, v in state_dict.items()}

    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    def wn(prefix):
        if f"{prefix}.weight_g" in state_dict:
            g = t(state_dict[f"{prefix}.weight_g"])
            v = t(state_dict[f"{prefix}.weight_v"])
        else:
            g = t(state_dict[f"{prefix}.parametrizations.weight.original0"])
            v = t(state_dict[f"{prefix}.parametrizations.weight.original1"])
        w = g * v / np.linalg.norm(v.reshape(v.shape[0], -1),
                                   axis=1).reshape(-1, 1, 1)
        return w, t(state_dict[f"{prefix}.bias"])

    p = {}
    w, b = wn("conv_pre")
    p["conv_pre"] = {"kernel": w.transpose(2, 1, 0), "bias": b}
    n_ups = len([k for k in state_dict if k.startswith("ups.")
                 and (k.endswith("weight_g") or k.endswith("original0"))])
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
