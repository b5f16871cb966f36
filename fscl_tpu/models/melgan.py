"""MelGAN generator (vocoder) in flax.

TPU-native equivalent of the torch MelGAN the reference loads via
torch.hub("descriptinc/melgan-neurips", "load_melgan", "multi_speaker")
(lightning/utils/tool.py:20-42 LightningMelGAN): mel (B, T, 80) ->
waveform (B, T*256). Architecture is the public melgan-neurips mel2wav
generator (reflection-padded weight-norm convs, 4 transposed-conv upsample
stages x3 dilated residual blocks); `convert_torch_checkpoint` maps its
state_dict layout so released weights load here.

Note the reference feeds `mel / ln(10)` into MelGAN (natural-log mel ->
log10); callers of this module should do the same (audio_out.vocoder does).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _leaky(x):
    return nn.leaky_relu(x, 0.2)


def _reflect_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class MelGANResnetBlock(nn.Module):
    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = _leaky(x)
        h = _reflect_pad(h, self.dilation)
        h = nn.Conv(self.channels, (3,), kernel_dilation=(self.dilation,),
                    padding="VALID", name="conv_dil")(h)
        h = _leaky(h)
        h = nn.Conv(self.channels, (1,), name="conv_1x1")(h)
        s = nn.Conv(self.channels, (1,), name="shortcut")(x)
        return s + h


class MelGANGenerator(nn.Module):
    """melgan-neurips config: 512 base channels, ratios (8, 8, 2, 2)."""
    n_mels: int = 80
    base_channels: int = 512
    ratios: Tuple[int, ...] = (8, 8, 2, 2)
    n_residual: int = 3

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, n_mels) log10-mel -> wav (B, T * prod(ratios))."""
        x = _reflect_pad(mel, 3)
        x = nn.Conv(self.base_channels, (7,), padding="VALID",
                    name="conv_pre")(x)
        for i, r in enumerate(self.ratios):
            ch = self.base_channels // (2 ** (i + 1))
            x = _leaky(x)
            # torch ConvTranspose1d(k=2r, stride=r, padding=r//2+r%2,
            # output_padding=r%2); for the even ratios used here flax SAME
            # pads the same (k-r)/2 = r/2 and yields out = in*r
            x = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="SAME",
                                 transpose_kernel=True, name=f"ups_{i}")(x)
            for j in range(self.n_residual):
                x = MelGANResnetBlock(ch, dilation=3 ** j,
                                      name=f"res_{i}_{j}")(x)
        x = _leaky(x)
        x = _reflect_pad(x, 3)
        x = nn.Conv(1, (7,), padding="VALID", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def convert_torch_checkpoint(state_dict) -> dict:
    """Map a melgan-neurips Generator state_dict (sequential `model.{i}`
    weight-norm convs) to this module's params."""
    def t(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x)

    def wn(prefix):
        g = t(state_dict[f"{prefix}.weight_g"])
        v = t(state_dict[f"{prefix}.weight_v"])
        w = g * v / np.linalg.norm(v.reshape(v.shape[0], -1),
                                   axis=1).reshape(-1, 1, 1)
        return w, t(state_dict[f"{prefix}.bias"])

    def conv(prefix):
        w, b = wn(prefix)
        return {"kernel": w.transpose(2, 1, 0), "bias": b}

    # strip an optional "mel2wav." / "model." scoping used by hub bundles
    keys = list(state_dict)
    scope = ""
    for cand in ("mel2wav.model", "model"):
        if any(k.startswith(cand + ".") for k in keys):
            scope = cand
            break

    def idx(i):
        return f"{scope}.{i}" if scope else str(i)

    n_ups = 4
    p = {"conv_pre": conv(idx(1))}
    for i in range(n_ups):
        base = 2 + i * (2 + 3)
        w, b = wn(idx(base + 1))
        # torch ConvTranspose1d weight (in, out, k) -> flax (k, out, in)
        p[f"ups_{i}"] = {"kernel": w.transpose(2, 1, 0), "bias": b}
        for j in range(3):
            rb = idx(base + 2 + j)
            p[f"res_{i}_{j}"] = {
                "conv_dil": conv(f"{rb}.block.2"),
                "conv_1x1": conv(f"{rb}.block.4"),
                "shortcut": conv(f"{rb}.shortcut"),
            }
    p["conv_post"] = conv(idx(24))
    return {"params": p}
