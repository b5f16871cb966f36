"""FFT-block transformer: encoder/decoder stacks + PostNet.

TPU-native re-design of the reference `transformer/` package
(Models.py:33-237, Layers.py:11-137, SubLayers.py:8-98, Modules.py:6-50):
same math (post-LN FFT blocks = MHA + conv1d FFN, key-side masking,
sinusoidal PE, masked fills after each sublayer), but with static shapes,
fused `ops.attend` attention (Pallas on TPU), and `nn.Conv` NWC layouts that
XLA maps straight onto the MXU — no transpose round-trips.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fscl_tpu.ops.attention import attend
from fscl_tpu.ops.masking import mask_fill


def sinusoid_position_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid PE table; formula matches transformer/Models.py:10-30."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head self-attention (SubLayers.py:8-58)."""
    n_head: int
    d_model: int
    dropout: float = 0.1
    dtype: Any = None     # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x, key_valid=None, deterministic: bool = True,
                 return_weights: bool = False):
        B, L, _ = x.shape
        d_k = self.d_model // self.n_head
        residual = x
        q = nn.Dense(self.n_head * d_k, dtype=self.dtype, name="w_qs")(x)
        k = nn.Dense(self.n_head * d_k, dtype=self.dtype, name="w_ks")(x)
        v = nn.Dense(self.n_head * d_k, dtype=self.dtype, name="w_vs")(x)

        def split(t):
            return t.reshape(B, L, self.n_head, d_k).transpose(0, 2, 1, 3)

        out = attend(
            split(q), split(k), split(v), key_valid=key_valid,
            temperature=d_k ** 0.5, return_weights=return_weights,
        )
        weights = None
        if return_weights:
            out, weights = out
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.n_head * d_k)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(name="layer_norm")(out + residual)
        return (out, weights) if return_weights else (out, None)


class ConvFFN(nn.Module):
    """Position-wise conv1d feed-forward, post-LN (SubLayers.py:61-98)."""
    d_model: int
    d_inner: int
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        h = nn.Conv(self.d_inner, (self.kernel_size[0],), padding="SAME",
                    dtype=self.dtype, name="w_1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.d_model, (self.kernel_size[1],), padding="SAME",
                    dtype=self.dtype, name="w_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="layer_norm")(h + residual)


class FFTBlock(nn.Module):
    """MHA + conv FFN with masked fills after each sublayer (Layers.py:11-31)."""
    d_model: int
    n_head: int
    d_inner: int
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid=None, deterministic: bool = True,
                 return_weights: bool = False):
        out, w = MultiHeadAttention(
            self.n_head, self.d_model, self.dropout, self.dtype,
            name="slf_attn"
        )(x, key_valid=valid, deterministic=deterministic,
          return_weights=return_weights)
        if valid is not None:
            out = mask_fill(out, valid)
        out = ConvFFN(
            self.d_model, self.d_inner, self.kernel_size, self.dropout,
            self.dtype, name="pos_ffn",
        )(out, deterministic=deterministic)
        if valid is not None:
            out = mask_fill(out, valid)
        return out, w


class FFTStack(nn.Module):
    """Shared body of Encoder2 / Decoder (Models.py:103-237): adds sinusoidal
    PE (recomputed statically when L > max_seq_len, replicating the eval-time
    PE extension) and runs n_layers FFT blocks. `remat` rematerializes each
    block's activations in the backward pass (jax.checkpoint — trades FLOPs
    for HBM, enabling larger batches/sequences)."""
    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    max_seq_len: int = 1000
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid, deterministic: bool = True):
        B, L, D = x.shape
        n_pos = max(self.max_seq_len + 1, L)
        pe = jnp.asarray(sinusoid_position_encoding(n_pos, self.d_model))
        x = x + pe[None, :L, :].astype(x.dtype)
        block_cls = (nn.remat(FFTBlock, static_argnums=(3, 4))
                     if self.remat else FFTBlock)
        for i in range(self.n_layers):
            x, _ = block_cls(
                self.d_model, self.n_head, self.d_inner, self.kernel_size,
                self.dropout, self.dtype, name=f"layer_{i}",
            )(x, valid, deterministic, False)
        return x


class Encoder(nn.Module):
    """Encoder2 semantics: embedding-less, takes pre-embedded text
    (Models.py:103-168). Train-time truncation to max_seq_len is a data
    pipeline invariant here (bucketed static shapes), not a slice."""
    n_layers: int = 4
    d_model: int = 256
    n_head: int = 2
    d_inner: int = 1024
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.2
    max_seq_len: int = 1000
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, emb_seq, valid, deterministic: bool = True):
        return FFTStack(
            self.n_layers, self.d_model, self.n_head, self.d_inner,
            self.kernel_size, self.dropout, self.max_seq_len, self.remat,
            self.dtype, name="stack",
        )(emb_seq, valid, deterministic)


class Decoder(nn.Module):
    """Mel decoder stack (Models.py:171-237)."""
    n_layers: int = 6
    d_model: int = 256
    n_head: int = 2
    d_inner: int = 1024
    kernel_size: Tuple[int, int] = (9, 1)
    dropout: float = 0.2
    max_seq_len: int = 1000
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid, deterministic: bool = True):
        return FFTStack(
            self.n_layers, self.d_model, self.n_head, self.d_inner,
            self.kernel_size, self.dropout, self.max_seq_len, self.remat,
            self.dtype, name="stack",
        )(x, valid, deterministic)


class PostNet(nn.Module):
    """5-layer conv postnet with batch norm + tanh (Layers.py:66-137)."""
    n_mel_channels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convolutions: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        use_ra = deterministic
        h = x
        for i in range(self.n_convolutions - 1):
            h = nn.Conv(
                self.embedding_dim, (self.kernel_size,), padding="SAME",
                dtype=self.dtype, name=f"conv_{i}",
            )(h)
            h = nn.BatchNorm(
                use_running_average=use_ra, momentum=0.9, name=f"bn_{i}"
            )(h)
            h = jnp.tanh(h)
            h = nn.Dropout(0.5)(h, deterministic=deterministic)
        h = nn.Conv(
            self.n_mel_channels, (self.kernel_size,), padding="SAME",
            dtype=self.dtype, name=f"conv_{self.n_convolutions - 1}",
        )(h)
        h = nn.BatchNorm(
            use_running_average=use_ra, momentum=0.9,
            name=f"bn_{self.n_convolutions - 1}",
        )(h)
        h = nn.Dropout(0.5)(h, deterministic=deterministic)
        return h
