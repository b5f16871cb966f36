"""Sequence-parallel frozen SSL upstream (frame axis sharded over the mesh).

Third parallel axis for the dominant FLOPs of FSCL meta-training, next to
tensor parallelism (`parallel/tensor_parallel.py`, weights split inside
every matmul) and pipeline parallelism (`parallel/pipeline.py`, layers split
into stages): here the TIME axis of the frame sequence is sharded over the
mesh. Every per-frame op (layer norms, QKV/out projections, the FFN,
residuals) runs on the local frame chunk; only attention needs cross-chunk
context, which is provided by an `all_gather` of the (much smaller than
activations-over-layers) K/V projections per layer — local Q against full
K/V, the standard gathered-KV sequence-parallel schedule. For long support
utterances this cuts per-device activation memory and per-frame compute by
the shard count at the cost of two (B, T, D) all_gathers per layer riding
ICI.

The layer wiring mirrors `models.hubert.TransformerLayer` op-for-op, with
every primitive applied through the SAME flax submodules and param subtrees
(no re-implemented math); equality with the monolithic forward is pinned by
tests/test_sequence_parallel.py.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fscl_tpu.ops.attention import attend


def _sp_layer(lp, x_loc, kv_valid_full, dim, n_heads, ffn_dim,
              layer_norm_first, axis):
    """One TransformerLayer step on a local frame chunk: Q from the chunk,
    K/V all-gathered to full length (models/hubert.py TransformerLayer —
    same submodules, sequence-parallel wiring)."""
    B, Tl, D = x_loc.shape
    dh = dim // n_heads

    ln1 = nn.LayerNorm()
    ln2 = nn.LayerNorm()

    def mha(h):
        q = nn.Dense(dim).apply({"params": lp["q_proj"]}, h)
        k = nn.Dense(dim).apply({"params": lp["k_proj"]}, h)
        v = nn.Dense(dim).apply({"params": lp["v_proj"]}, h)
        # gather keys/values across the frame shards: (B, T_full, D)
        k = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        Tf = k.shape[1]
        split_q = q.reshape(B, Tl, n_heads, dh).transpose(0, 2, 1, 3)
        split = lambda t: t.reshape(B, Tf, n_heads, dh).transpose(0, 2, 1, 3)
        o = attend(split_q, split(k), split(v), key_valid=kv_valid_full,
                   temperature=dh ** 0.5)
        o = o.transpose(0, 2, 1, 3).reshape(B, Tl, dim)
        return nn.Dense(dim).apply({"params": lp["out_proj"]}, o)

    def ffn(h):
        h = nn.Dense(ffn_dim).apply({"params": lp["fc1"]}, h)
        h = nn.gelu(h)
        return nn.Dense(dim).apply({"params": lp["fc2"]}, h)

    ln1_p = {"params": lp["self_attn_layer_norm"]}
    ln2_p = {"params": lp["final_layer_norm"]}
    if layer_norm_first:
        x_loc = x_loc + mha(ln1.apply(ln1_p, x_loc))
        x_loc = x_loc + ffn(ln2.apply(ln2_p, x_loc))
    else:
        x_loc = ln1.apply(ln1_p, x_loc + mha(x_loc))
        x_loc = ln2.apply(ln2_p, x_loc + ffn(x_loc))
    return x_loc


def sequence_parallel_upstream_features(upstream, params, wavs, wav_valid,
                                        mesh, axis: str = "model",
                                        compute_dtype: str = "float32"):
    """Drop-in parallel of `models.hubert.frozen_upstream_features` with the
    transformer stack sequence-parallel over `mesh[axis]`: same
    (hidden (B, T', n_layers+1, D), frame_valid) contract. The frame axis
    is padded (as invalid frames) to a multiple of the shard count, so any
    bucketed T' works. Accepts per-layer or scanned param layouts."""
    from fscl_tpu.models.hubert import (
        dequant_and_cast_inputs, pre_transformer_features,
        stack_layer_params,
    )

    S = mesh.shape[axis]

    p = params["params"] if "params" in params else params
    if "layers" not in p:
        p = stack_layer_params(p, upstream.n_layers)
    params, wavs = dequant_and_cast_inputs({"params": p}, wavs,
                                           compute_dtype)

    x, frame_valid = pre_transformer_features(
        upstream, params, wavs, wav_valid)
    B, T, D = x.shape
    pad = (-T) % S
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        fv = jnp.pad(frame_valid, ((0, 0), (0, pad)))
    else:
        fv = frame_valid

    layers = params["params"]["layers"]

    def shard_fn(x_loc, fv_loc, layers_repl):
        fv_full = jax.lax.all_gather(fv_loc, axis, axis=1, tiled=True)

        def body(h, lp):
            y = _sp_layer(lp, h, fv_full, upstream.dim, upstream.n_heads,
                          upstream.ffn_dim, upstream.layer_norm_first, axis)
            return y, y

        _, ys = jax.lax.scan(body, x_loc, layers_repl)
        return jnp.moveaxis(ys, 0, 2)          # (B, T_loc, n_layers, D)

    ys = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis), P()),
        out_specs=P(None, axis, None, None),
    )(x, fv, layers)                           # (B, T+pad, n_layers, D)

    hidden = jnp.concatenate([x[:, :, None], ys], axis=2)[:, :T]
    return (jax.lax.stop_gradient(hidden.astype(jnp.float32)),
            frame_valid)
