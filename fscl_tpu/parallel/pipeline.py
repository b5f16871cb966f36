"""Pipeline-parallel frozen SSL upstream (GPipe schedule over a device mesh).

The frozen upstream forward is the dominant FLOPs of FSCL meta-training
(reference: the S3PRL extractor at TransEmbOrig.py:37-60 runs hubert-large
over every support utterance). `parallel/tensor_parallel.py` shards its
weights WITHIN every matmul; this module is the orthogonal axis: the
identical transformer layers are split into contiguous STAGES over the mesh
axis, and microbatches stream through the stages with `ppermute` handoffs —
the classic pipeline schedule, expressed as one SPMD `shard_map` program.

Because the upstream is frozen (forward-only, `stop_gradient` at the
boundary), no backward schedule or bubble bookkeeping is needed: the whole
pipeline is a single `lax.scan` over M + S - 1 ticks. Per device this holds
1/S of the layer weights AND 1/S of the all-layer hidden-state buffer — the
memory wall for XLSR-scale upstreams (reference Define.py:32-51) drops by
the stage count, at the cost of one (B_micro, T, D) ppermute per tick
riding ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipeline_upstream_features(upstream, params, wavs, wav_valid, mesh,
                               axis: str = "model",
                               n_micro: int | None = None,
                               compute_dtype: str = "float32"):
    """Drop-in parallel of `models.hubert.frozen_upstream_features`: same
    (hidden (B, T', n_layers+1, D), frame_valid) contract, computed with
    the transformer stack pipeline-parallel over `mesh[axis]`.

    Requirements: `upstream.n_layers % n_stages == 0` and
    `B % n_micro == 0`. Accepts per-layer or scanned param layouts.
    """
    from fscl_tpu.models.hubert import (
        TransformerLayer, dequant_and_cast_inputs, pre_transformer_features,
        stack_layer_params,
    )

    S = mesh.shape[axis]
    if upstream.n_layers % S != 0:
        raise ValueError(
            f"n_layers={upstream.n_layers} not divisible by "
            f"{S} pipeline stages")

    p = params["params"] if "params" in params else params
    if "layers" not in p:
        p = stack_layer_params(p, upstream.n_layers)
    params, wavs = dequant_and_cast_inputs({"params": p}, wavs,
                                           compute_dtype)

    # pre-transformer part (conv extractor + projection + pos conv) is
    # cheap relative to the stack — computed replicated, once
    x, frame_valid = pre_transformer_features(
        upstream, params, wavs, wav_valid)
    B, T, D = x.shape
    M = n_micro or S
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    Bm = B // M
    xm = x.reshape(M, Bm, T, D)
    fvm = frame_valid.reshape(M, Bm, T)

    layer_mod = TransformerLayer(
        upstream.dim, upstream.n_heads, upstream.ffn_dim,
        upstream.layer_norm_first)
    layers = params["params"]["layers"]
    l_loc = jax.tree_util.tree_leaves(layers)[0].shape[0] // S

    def stage_fn(xm, fvm, layers_local):
        sidx = jax.lax.axis_index(axis)
        outputs0 = jnp.zeros((M, Bm, T, l_loc, D), xm.dtype)

        def run_local_stack(x_in, fv_in):
            def body(h, lp):
                y = layer_mod.apply({"params": lp}, h, fv_in)
                return y, y
            _, ys = jax.lax.scan(body, x_in, layers_local)
            return ys                          # (l_loc, Bm, T, D)

        def tick(carry, t):
            cur, outputs = carry
            # stage s processes microbatch (t - s) at tick t; stage 0's
            # input comes from the stream, later stages' from the previous
            # tick's ppermute
            mb = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x_in = jnp.where(sidx == 0, mb, cur)
            mi = jnp.clip(t - sidx, 0, M - 1)
            fv_in = jax.lax.dynamic_index_in_dim(fvm, mi, 0, keepdims=False)
            ys = run_local_stack(x_in, fv_in)
            live = (t - sidx >= 0) & (t - sidx < M)
            upd = jnp.moveaxis(ys, 0, 2)       # (Bm, T, l_loc, D)
            old = jax.lax.dynamic_index_in_dim(
                outputs, mi, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(live, upd, old), mi, 0)
            nxt = jax.lax.ppermute(
                ys[-1], axis, [(i, i + 1) for i in range(S - 1)])
            return (nxt, outputs), None

        # the carry is device-varying (ppermute / axis_index inside the
        # body); mark the initial values accordingly (shard_map vma typing)
        cur0 = jax.lax.pvary(jnp.zeros((Bm, T, D), xm.dtype), (axis,))
        outputs0 = jax.lax.pvary(outputs0, (axis,))
        (_, outputs), _ = jax.lax.scan(
            tick, (cur0, outputs0), jnp.arange(M + S - 1))
        return outputs.reshape(B, T, l_loc, D)

    ys = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(None, None, axis, None),
    )(xm, fvm, layers)                         # (B, T, n_layers, D)

    hidden = jnp.concatenate([x[:, :, None], ys], axis=2)
    return (jax.lax.stop_gradient(hidden.astype(jnp.float32)),
            frame_valid)


def attach_parallel_upstream(system, mode: str, mesh, axis: str = "model",
                             n_micro: int | None = None):
    """Install a parallel schedule for a system's frozen-upstream forward.

    Every SSL system's `extract_ssl` dispatches through the optional
    `system.upstream_forward` hook (falling back to the monolithic
    `frozen_upstream_features`); this binds that hook to the pipeline- or
    sequence-parallel schedule over `mesh[axis]`, so meta-training /
    PR / T2U steps run their dominant FLOPs sharded without any change to
    the training code. `mode` is "pp" (parallel/pipeline.py) or "sp"
    (parallel/sequence_parallel.py); "none" removes the hook."""
    if mode == "none":
        system.upstream_forward = None
        return system
    if mode == "pp":
        def fwd(upstream, params, wavs, valid, compute_dtype="float32"):
            return pipeline_upstream_features(
                upstream, params, wavs, valid, mesh, axis=axis,
                n_micro=n_micro, compute_dtype=compute_dtype)
    elif mode == "sp":
        from fscl_tpu.parallel.sequence_parallel import (
            sequence_parallel_upstream_features,
        )

        def fwd(upstream, params, wavs, valid, compute_dtype="float32"):
            return sequence_parallel_upstream_features(
                upstream, params, wavs, valid, mesh, axis=axis,
                compute_dtype=compute_dtype)
    else:
        raise ValueError(f"unknown upstream parallel mode: {mode!r}")
    system.upstream_forward = fwd
    return system
