"""Phoneme embedding tables + codebook attention (TransEmb / FSCL core).

Re-design of lightning/systems/language/embeddings.py:
- MultilingualEmbedding (8-31): per-symbol-set tables as a param dict —
  a pytree, so the tune-time "embedding transplant"
  (tune/FastSpeech2Tune.py:71) is a pure functional param update.
- SoftMultiAttCodebook2 (77-142): learned softmax weights over SSL layers,
  q-projection, multi-head attention against learned att/emb banks. One
  fused XLA computation per episode; PAD zeroing and NaN guarding included.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _xavier_uniform_zero_pad(key, shape, dtype=jnp.float32, padding_idx: int = 0):
    """Xavier-uniform init with the PAD row zeroed (embeddings.py:17-22)."""
    n, dim = shape
    std = math.sqrt(2.0 / (n + dim))
    val = math.sqrt(3.0) * std
    w = jax.random.uniform(key, shape, dtype, minval=-val, maxval=val)
    return w.at[padding_idx].set(0.0)


class MultilingualEmbedding(nn.Module):
    """One embedding table per symbol set; lookup by symbol_id or over the
    concatenation of all tables (embeddings.py:25-31)."""
    id2symbols: Tuple[Tuple[str, int], ...]   # ((symbol_id, n_symbols), ...)
    dim: int = 256
    padding_idx: int = 0

    def setup(self):
        tables = {}
        for symbol_id, n in self.id2symbols:
            if n > 0:
                tables[f"table-{symbol_id}"] = self.param(
                    f"table-{symbol_id}", _xavier_uniform_zero_pad, (n, self.dim)
                )
        self.tables = tables

    def _lookup(self, table, x):
        emb = jnp.take(table, x, axis=0)
        return jnp.where((x == self.padding_idx)[..., None], 0.0, emb)

    def __call__(self, x, symbol_id: Optional[str] = None):
        if symbol_id is None:
            concat = jnp.concatenate(list(self.tables.values()), axis=0)
            return self._lookup(concat, x)
        return self._lookup(self.tables[f"table-{symbol_id}"], x)


class SoftMultiAttCodebook(nn.Module):
    """Codebook attention without layer weighting / q-projection
    (embeddings.py:37-74). Query is already in model space."""
    codebook_size: int = 128
    dim: int = 256
    num_heads: int = 4
    temperature: Optional[float] = None   # None -> sqrt(dim/heads); ref ATTTEMP flag

    @nn.compact
    def __call__(self, query, need_weights: bool = False):
        d_head = self.dim // self.num_heads
        temp = self.temperature if self.temperature is not None else d_head ** 0.5
        emb_banks = self.param(
            "emb_banks", nn.initializers.normal(1.0), (self.codebook_size, self.dim))
        att_banks = self.param(
            "att_banks", nn.initializers.normal(1.0), (self.codebook_size, self.dim))

        B, L, _ = query.shape
        q = query.reshape(B, L, self.num_heads, d_head).transpose(0, 2, 1, 3)
        k = att_banks.reshape(self.codebook_size, self.num_heads, d_head)
        k = k.transpose(1, 0, 2)[None]
        v = emb_banks.reshape(self.codebook_size, self.num_heads, d_head)
        v = v.transpose(1, 0, 2)[None]
        scores = jnp.einsum("bhld,xhcd->bhlc", q, k,
                            preferred_element_type=jnp.float32) / temp
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhlc,xhcd->bhld", attn, jnp.broadcast_to(v, (1,) + v.shape[1:]),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        return (out, attn) if need_weights else (out, None)


class SoftMultiAttCodebook2(nn.Module):
    """Layer-weighted codebook attention (embeddings.py:77-142).

    ref: (B, L, n_layers, upstream_dim) SSL features (or a phoneme-query
    table with B=1, L=n_symbols). Returns (B, L, dim) generated embeddings.
    """
    codebook_size: int = 128
    dim: int = 256
    num_heads: int = 4
    upstream_dim: int = 1024
    n_layers: int = 25
    layer_idx: Optional[int] = None   # pin one layer (Define.LAYER_IDX)
    use_layer_weights: bool = True    # False for "mel" upstream (single layer)

    @nn.compact
    def __call__(self, ref, need_weights: bool = False):
        d_head = self.dim // self.num_heads
        temp = d_head ** 0.5
        ref = jnp.nan_to_num(ref)
        B = ref.shape[0]

        if self.use_layer_weights:
            weight_raw = self.param(
                "weight_raw", nn.initializers.zeros, (1, self.n_layers, 1))
            if self.layer_idx is not None:
                pinned = jnp.full((1, self.n_layers, 1), -1e9)
                pinned = pinned.at[0, self.layer_idx, 0].set(10.0)
                weight_raw = jax.lax.stop_gradient(pinned)
            layer_w = jax.nn.softmax(weight_raw[None], axis=2)  # (1,1,n_layers,1)
            ref = jnp.sum(layer_w * ref, axis=2)                # (B, L, upstream_dim)
        else:
            ref = ref.reshape(ref.shape[0], ref.shape[1], -1)

        q = nn.Dense(self.dim, name="q_linear")(ref)
        emb_banks = self.param(
            "emb_banks", nn.initializers.normal(1.0), (self.codebook_size, self.dim))
        att_banks = self.param(
            "att_banks", nn.initializers.normal(1.0), (self.codebook_size, self.dim))

        L = q.shape[1]
        qh = q.reshape(B, L, self.num_heads, d_head).transpose(0, 2, 1, 3)
        k = att_banks.reshape(self.codebook_size, self.num_heads, d_head).transpose(1, 0, 2)
        v = emb_banks.reshape(self.codebook_size, self.num_heads, d_head).transpose(1, 0, 2)
        scores = jnp.einsum("bhld,hcd->bhlc", qh, k,
                            preferred_element_type=jnp.float32) / temp
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhlc,hcd->bhld", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        return (out, attn) if need_weights else (out, None)

    def layer_weights(self, params) -> Optional[jnp.ndarray]:
        """Softmax layer weights for observability (TransEmbOrig logging)."""
        if not self.use_layer_weights:
            return None
        return jax.nn.softmax(params["params"]["weight_raw"], axis=1)[..., 0]
