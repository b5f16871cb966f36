"""SSL downstream heads (t2u + phoneme recognition).

Re-provides lightning/systems/t2u/downstreams.py:10-188 and
phoneme_recognition/downstreams.py: learned weighted sum over SSL layers,
then linear / BiLSTM / transformer-block (Downstream1) / codeformer
(Downstream2) projections, plus the PR heads
(phoneme_recognition/heads.py:7-50).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fscl_tpu.ops.attention import attend
from fscl_tpu.ops.masking import mask_fill


class WeightedSumLayer(nn.Module):
    """Softmax-weighted sum over SSL layers (downstreams.py:10-29);
    `specific_layer` pins a one-hot (frozen) weight."""
    n_in_layers: int
    specific_layer: Optional[int] = None

    @nn.compact
    def __call__(self, x, axis: int = 2):
        w_raw = self.param("weight_raw", nn.initializers.normal(1.0),
                           (self.n_in_layers,))
        if self.specific_layer is not None:
            pinned = jnp.full((self.n_in_layers,), -1e9)
            pinned = pinned.at[self.specific_layer].set(10.0)
            w_raw = jax.lax.stop_gradient(pinned)
        w = jax.nn.softmax(w_raw)
        shape = [1] * x.ndim
        shape[axis] = self.n_in_layers
        return jnp.sum(w.reshape(shape) * x, axis=axis)


class LinearDownstream(nn.Module):
    """Weighted sum + linear projection (downstreams.py:32-54)."""
    n_in_layers: int
    d_out: int
    specific_layer: Optional[int] = None

    @nn.compact
    def __call__(self, reprs):
        x = WeightedSumLayer(self.n_in_layers, self.specific_layer,
                             name="weighted_sum")(reprs)
        return nn.Dense(self.d_out, name="proj")(x)


class BiLSTMDownstream(nn.Module):
    """Weighted sum + proj + 2-layer BiLSTM (downstreams.py:57-88)."""
    n_in_layers: int
    d_out: int
    specific_layer: Optional[int] = None

    @nn.compact
    def __call__(self, reprs, valid=None):
        x = WeightedSumLayer(self.n_in_layers, self.specific_layer,
                             name="weighted_sum")(reprs)
        x = nn.Dense(self.d_out, name="proj")(x)
        half = self.d_out // 2
        seq_lengths = (jnp.sum(valid.astype(jnp.int32), axis=-1)
                       if valid is not None else None)
        for i in range(2):
            fwd = nn.RNN(nn.OptimizedLSTMCell(half), name=f"lstm_{i}_fwd")(
                x, seq_lengths=seq_lengths)
            bwd = nn.RNN(nn.OptimizedLSTMCell(half), name=f"lstm_{i}_bwd",
                         reverse=True, keep_order=True)(
                x, seq_lengths=seq_lengths)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            if valid is not None:
                x = mask_fill(x, valid)
        return x


class EncoderBlock(nn.Module):
    """Pre-dropout post-LN transformer encoder block (dlhlp_lib
    TransformerEncoderBlock equivalent used by Downstream1)."""
    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, valid=None, deterministic: bool = True):
        B, L, _ = x.shape
        dh = self.d_model // self.n_head
        q = nn.Dense(self.d_model, name="q")(x)
        k = nn.Dense(self.d_model, name="k")(x)
        v = nn.Dense(self.d_model, name="v")(x)
        split = lambda t: t.reshape(B, L, self.n_head, dh).transpose(0, 2, 1, 3)
        o = attend(split(q), split(k), split(v), key_valid=valid,
                   temperature=dh ** 0.5)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, self.d_model)
        o = nn.Dense(self.d_model, name="out")(o)
        o = nn.Dropout(self.dropout)(o, deterministic=deterministic)
        x = nn.LayerNorm(name="ln1")(x + o)
        h = nn.Dense(self.d_ff, name="ff1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, name="ff2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="ln2")(x + h)


class CodeformerBlock(nn.Module):
    """Cross-attention to a learned codebook + FFN (dlhlp_lib CodeformerBlock
    equivalent, used as the last layer of Downstream2)."""
    codebook_size: int
    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True, need_weights: bool = False):
        B, L, _ = x.shape
        dh = self.d_model // self.n_head
        codes = self.param("codebook", nn.initializers.normal(1.0),
                           (self.codebook_size, self.d_model))
        q = nn.Dense(self.d_model, name="q")(x)
        qh = q.reshape(B, L, self.n_head, dh).transpose(0, 2, 1, 3)
        kh = codes.reshape(self.codebook_size, self.n_head, dh).transpose(1, 0, 2)
        scores = jnp.einsum("bhld,hcd->bhlc", qh, kh,
                            preferred_element_type=jnp.float32) / dh ** 0.5
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhlc,hcd->bhld", attn, kh)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, self.d_model)
        o = nn.Dense(self.d_model, name="out")(o)
        x = nn.LayerNorm(name="ln1")(x + o)
        h = nn.relu(nn.Dense(self.d_ff, name="ff1")(x))
        h = nn.Dense(self.d_model, name="ff2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(name="ln2")(x + h)
        return (x, attn) if need_weights else (x, None)


class Downstream1(nn.Module):
    """Weighted sum + proj + N transformer blocks (downstreams.py:91-132)."""
    n_in_layers: int
    d_model: int = 256
    n_head: int = 2
    d_ff: Tuple[int, ...] = (1024, 1024)
    dropout: float = 0.1
    specific_layer: Optional[int] = None

    @nn.compact
    def __call__(self, reprs, valid=None, deterministic: bool = True):
        x = WeightedSumLayer(self.n_in_layers, self.specific_layer,
                             name="weighted_sum")(reprs)
        x = nn.Dense(self.d_model, name="proj")(x)
        for i, ff in enumerate(self.d_ff):
            x = EncoderBlock(self.d_model, self.n_head, ff, self.dropout,
                             name=f"layer_{i}")(x, valid, deterministic)
        return x


class Downstream2(nn.Module):
    """Downstream1 with a CodeformerBlock last (downstreams.py:135-188)."""
    n_in_layers: int
    codebook_size: int = 128
    d_model: int = 256
    n_head: int = 2
    d_ff: Tuple[int, ...] = (1024, 1024)
    dropout: float = 0.1
    specific_layer: Optional[int] = None

    @nn.compact
    def __call__(self, reprs, valid=None, deterministic: bool = True,
                 need_weights: bool = False):
        x = WeightedSumLayer(self.n_in_layers, self.specific_layer,
                             name="weighted_sum")(reprs)
        x = nn.Dense(self.d_model, name="proj")(x)
        for i, ff in enumerate(self.d_ff[:-1]):
            x = EncoderBlock(self.d_model, self.n_head, ff, self.dropout,
                             name=f"layer_{i}")(x, valid, deterministic)
        return CodeformerBlock(
            self.codebook_size, self.d_model, self.n_head, self.d_ff[-1],
            self.dropout, name="codeformer",
        )(x, deterministic, need_weights)


class MultilingualPRHead(nn.Module):
    """Per-language linear classification heads (heads.py:7-19)."""
    id2symbols: Tuple[Tuple[str, int], ...]
    d_in: int = 256

    @nn.compact
    def __call__(self, x, symbol_id: str):
        for sid, n in self.id2symbols:
            if sid == symbol_id:
                return nn.Dense(n, name=f"head-{sid}")(x)
        raise KeyError(symbol_id)


class MultilingualClusterHead(nn.Module):
    """Per-language cluster centers; cosine (temperature-scaled) or -L2
    similarity logits (heads.py:22-50)."""
    id2symbols: Tuple[Tuple[str, int], ...]
    d_in: int = 256
    temperature: float = 0.1
    mode: str = "cos"

    @nn.compact
    def __call__(self, x, symbol_id: str):
        for sid, n in self.id2symbols:
            if sid != symbol_id:
                continue
            centers = self.param(f"head-{sid}", nn.initializers.normal(1.0),
                                 (n, self.d_in))
            if self.mode == "cos":
                xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
                cn = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-8)
                sim = jnp.einsum("bld,cd->blc", xn, cn)
                return sim / self.temperature
            if self.mode == "l2":
                d = x[:, :, None, :] - centers[None, None, :, :]
                return -jnp.linalg.norm(d, axis=-1)
            raise NotImplementedError(self.mode)
        raise KeyError(symbol_id)
