"""Attention ops: XLA reference path + fused Pallas TPU kernel.

The reference computes scaled-dot-product attention with bmm/softmax/bmm and
key-side masking (transformer/Modules.py:6-30, SubLayers.py:8-58). TTS
sequences are short (max_seq_len 1000-1500), so a whole (batch, head) slice
of Q/K/V plus the score matrix fits comfortably in VMEM; the Pallas kernel
fuses QK^T -> mask -> softmax -> PV into one pass over HBM instead of three.

`attend()` dispatches: Pallas on TPU for aligned shapes, XLA otherwise —
numerics are identical up to fp reassociation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def xla_attention(
    q: jnp.ndarray,            # (B, H, Lq, Dh)
    k: jnp.ndarray,            # (B, H, Lk, Dh)
    v: jnp.ndarray,            # (B, H, Lk, Dh)
    key_valid: Optional[jnp.ndarray] = None,   # (B, Lk) bool, True = valid
    temperature: Optional[float] = None,
    return_weights: bool = False,
):
    """Plain XLA attention; key-only masking like the reference."""
    dh = q.shape[-1]
    temp = temperature if temperature is not None else dh ** 0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / temp
    if key_valid is not None:
        scores = jnp.where(key_valid[:, None, None, :], scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype)
    if return_weights:
        return out, weights
    return out


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, temp: float):
    q = q_ref[0].astype(jnp.float32)              # (Lq, Dh)
    k = k_ref[0].astype(jnp.float32)              # (Lk, Dh)
    v = v_ref[0].astype(jnp.float32)              # (Lk, Dh)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / temp                                       # (Lq, Lk)
    valid = mask_ref[0] > 0                        # (1, Lk) -> broadcast rows
    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    w = e / s
    o = jax.lax.dot_general(
        w, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("temperature",))
def pallas_attention(
    q: jnp.ndarray,            # (B, H, L, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray,    # (B, L) bool
    temperature: Optional[float] = None,
) -> jnp.ndarray:
    from jax.experimental.pallas import tpu as pltpu  # deferred: TPU only

    B, H, L, Dh = q.shape
    temp = float(temperature if temperature is not None else Dh ** 0.5)
    qf = q.reshape(B * H, L, Dh)
    kf = k.reshape(B * H, L, Dh)
    vf = v.reshape(B * H, L, Dh)
    mask = jnp.repeat(key_valid.astype(jnp.int32), H, axis=0)[:, None, :]  # (B*H,1,L)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, temp=temp),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, L, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, L, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * L * L * Dh,
            bytes_accessed=4 * B * H * L * Dh * 4,
            transcendentals=B * H * L * L,
        ),
    )(qf, kf, vf, mask)
    return out.reshape(B, H, L, Dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pallas_attention_ad(q, k, v, key_valid, temperature):
    """Differentiable wrapper: Pallas forward, XLA-recompute backward.

    The backward pass re-runs the (cheap, short-sequence) XLA attention and
    differentiates it — same math, so gradients match the XLA path exactly.
    """
    return pallas_attention(q, k, v, key_valid, temperature)


def _pallas_attention_fwd(q, k, v, key_valid, temperature):
    return pallas_attention(q, k, v, key_valid, temperature), (q, k, v, key_valid)


def _pallas_attention_bwd(temperature, res, g):
    q, k, v, key_valid = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(q_, k_, v_, key_valid, temperature),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_pallas_attention_ad.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def _tpu_ok(L: int, dh: int) -> bool:
    # dh=128 only: measured on v5e (B=4,H=16,L=512), the whole-seq kernel at
    # dh=64 runs at half lane utilization and loses to XLA's fused attention
    # (1.99 ms vs 1.42 ms), so HuBERT-style heads stay on the XLA path.
    return (
        jax.default_backend() == "tpu"
        and L % 128 == 0
        and dh % 128 == 0
        and L <= 2048
    )


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: Optional[jnp.ndarray] = None,
    temperature: Optional[float] = None,
    return_weights: bool = False,
    use_pallas: bool = True,
):
    """Self-attention dispatch. Shapes (B, H, L, Dh)."""
    B, H, L, Dh = q.shape
    if (
        use_pallas
        and not return_weights
        and key_valid is not None
        and q.shape == k.shape
        and _tpu_ok(L, Dh)
    ):
        return _pallas_attention_ad(q, k, v, key_valid, temperature)
    return xla_attention(q, k, v, key_valid, temperature, return_weights)
