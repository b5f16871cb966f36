"""Length-mask utilities (static-shape, jit-friendly).

Convention: `True` = VALID position. The reference uses the opposite
convention internally (`get_mask_from_lengths` returns True at PAD;
dlhlp_lib) — we standardize on valid-masks and flip at loss boundaries,
because `jnp.where(valid, x, 0)` fuses better than masked_fill chains.
"""
from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool, True where index < length."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def attn_mask_from_valid(valid: jnp.ndarray) -> jnp.ndarray:
    """(B, L) valid mask -> (B, L, L) attention mask, True where key valid.

    Matches the reference's self-attention masking which only masks keys
    (transformer/Models.py:79: mask.unsqueeze(1).expand(-1, max_len, -1)).
    """
    return jnp.broadcast_to(valid[:, None, :], valid.shape[:1] + (valid.shape[1], valid.shape[1]))


def mask_fill(x: jnp.ndarray, valid: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Zero (or fill) invalid positions; valid broadcast over trailing dims."""
    while valid.ndim < x.ndim:
        valid = valid[..., None]
    return jnp.where(valid, x, jnp.asarray(fill, dtype=x.dtype))


def masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over valid positions — equivalent to the reference's
    masked_select(...).mean() loss reductions (lightning/model/loss.py)."""
    while valid.ndim < x.ndim:
        valid = valid[..., None]
    valid = jnp.broadcast_to(valid, x.shape)
    total = jnp.sum(jnp.where(valid, x, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count
