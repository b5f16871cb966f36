"""Legacy ASR codebook-matching components.

Re-provides lightning/model/asr_model.py:15-234: `Codebook` — layer-weighted
multi-head attention *map* (not output) between SSL references and learned
banks, used for codebook-matching analysis/visualization — and
`ASRCenterHead` — per-language learnable phoneme centers classifying frames
by (negative squared) distance, trained with a center loss.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MatchingCodebook(nn.Module):
    """Attention map against learned banks (asr_model.py Codebook)."""
    size: int = 128
    d_in: int = 1024
    dim: int = 256
    num_heads: int = 4
    n_layers: int = 25
    temperature: Optional[float] = None

    @nn.compact
    def __call__(self, ref):
        """ref (B, L, n_layers, d_in) -> attention map (B, nH, L, size)."""
        d_head = self.dim // self.num_heads
        temp = (self.temperature if self.temperature is not None
                else d_head ** 0.5)
        ref = jnp.nan_to_num(ref)
        w = self.param("weight_raw", nn.initializers.zeros,
                       (1, 1, self.n_layers, 1))
        ref = jnp.sum(jax.nn.softmax(w, axis=2) * ref, axis=2)
        banks = self.param("banks", nn.initializers.normal(1.0),
                           (self.size, self.dim))
        B, L, _ = ref.shape
        q = nn.Dense(self.dim, name="q_linear")(ref)
        q = q.reshape(B, L, self.num_heads, d_head).transpose(0, 2, 1, 3)
        k = banks.reshape(self.size, self.num_heads, d_head).transpose(1, 0, 2)
        attn = jnp.einsum("bhld,hsd->bhls", q, k,
                          preferred_element_type=jnp.float32) / temp
        return jax.nn.softmax(attn, axis=-1)


class ASRCenterHead(nn.Module):
    """Per-language phoneme centers; -||x - c||^2 logits + center loss
    (asr_model.py ASRCenterHead)."""
    id2symbols: Tuple[Tuple[str, int], ...]
    dim: int = 256

    @nn.compact
    def __call__(self, x, symbol_id: str, targets=None):
        for sid, n in self.id2symbols:
            if sid != symbol_id:
                continue
            centers = self.param(f"centers-{sid}",
                                 nn.initializers.normal(1.0), (n, self.dim))
            d = x[..., None, :] - centers           # (..., n, dim)
            logits = -jnp.sum(d * d, axis=-1)
            if targets is None:
                return logits, None
            tc = jnp.take(centers, targets, axis=0)
            center_loss = jnp.mean(jnp.sum((x - tc) ** 2, axis=-1))
            return logits, center_loss
        raise KeyError(symbol_id)
