"""Tensor parallelism over the `model` mesh axis (beyond-parity extension).

The reference has data parallelism only (SURVEY §2.10); the mesh here always
carried a `model` axis for extensions. This module provides the sharding
rules that put it to work for FastSpeech2: the conv-FFN's inner dimension
(d_model -> 1024 -> d_model, the FLOPs-dominant matmuls) and the attention
head projections are Megatron-style column/row sharded, so each model-shard
holds half the FFN and half the heads; XLA inserts the reduce-scatter/
all-reduce on the row-parallel matmuls automatically from the shardings.

Usage:
    mesh = make_mesh(n_data=4, n_model=2)
    state = shard_state(state, mesh, fastspeech2_param_spec)
    step = make_tp_train_step(system, mesh)
"""
from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fscl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, batch_sharding


def fastspeech2_param_spec(path: str, leaf) -> P:
    """Dotted-path -> PartitionSpec for FastSpeech2 params.

    Column-parallel: FFN w_1 (k, d_model, d_inner) shards d_inner; attention
    q/k/v projections (d_model, heads*dh) shard the head dim.
    Row-parallel: FFN w_2 (k, d_inner, d_model) shards d_inner; attention
    output fc (heads*dh, d_model) shards the input dim.
    Everything else replicated.
    """
    if re.search(r"pos_ffn.w_1.kernel$", path):
        return P(None, None, MODEL_AXIS)
    if re.search(r"pos_ffn.w_1.bias$", path):
        return P(MODEL_AXIS)
    if re.search(r"pos_ffn.w_2.kernel$", path):
        return P(None, MODEL_AXIS, None)
    if re.search(r"slf_attn.w_[qkv]s.kernel$", path):
        return P(None, MODEL_AXIS)
    if re.search(r"slf_attn.w_[qkv]s.bias$", path):
        return P(MODEL_AXIS)
    if re.search(r"slf_attn.fc.kernel$", path):
        return P(MODEL_AXIS, None)
    return P()


def upstream_param_spec(path: str, leaf) -> P:
    """Dotted-path -> PartitionSpec for the (frozen) SSL upstream
    (models/hubert.py) — Megatron column/row sharding of the transformer
    layers so a 300M-param hubert-large (or larger XLSR,
    /root/reference/Define.py:32-51) is no longer replicated per device.

    Handles BOTH layer layouts: per-layer (`layer_3.q_proj.kernel`,
    (d, d)) and the nn.scan stack (`layers.q_proj.kernel`,
    (n_layers, d, d)) — scanned leaves carry a leading layer axis, so every
    spec gains a leading None. Conv feature extractor, layer norms and
    positional conv stay replicated (tiny)."""
    scan = ".layers." in f".{path}" or path.startswith("layers.")
    pre = (None,) if scan else ()
    if re.search(r"(q_proj|k_proj|v_proj|fc1)\.kernel$", path):
        return P(*pre, None, MODEL_AXIS)    # column parallel
    if re.search(r"(q_proj|k_proj|v_proj|fc1)\.bias$", path):
        return P(*pre, MODEL_AXIS)
    if re.search(r"(out_proj|fc2)\.kernel$", path):
        return P(*pre, MODEL_AXIS, None)    # row parallel
    return P()


def frozen_spec(path: str, leaf) -> P:
    """Spec for TrainState.frozen collections: upstream transformer layers
    TP-sharded, anything else replicated."""
    if path.startswith("upstream.") or ".upstream." in f".{path}":
        sub = path.split("upstream.", 1)[1]
        # strip the flax variables wrapper ({"params": ...})
        if sub.startswith("params."):
            sub = sub[len("params."):]
        return upstream_param_spec(sub, leaf)
    return P()


def _spec_tree(params, spec_fn: Callable[[str, Any], P]):
    def walk(path, leaf):
        dotted = ".".join(str(getattr(k, "key", k)) for k in path)
        return spec_fn(dotted, leaf)

    return jax.tree_util.tree_map_with_path(walk, params)


def state_shardings(state, mesh: Mesh, spec_fn=fastspeech2_param_spec,
                    frozen_spec_fn=frozen_spec):
    """NamedShardings for a TrainState: params by spec_fn; Adam mu/nu mirror
    the param specs (same treedef); frozen collections by frozen_spec_fn
    (upstream TP-sharded by default); everything else replicated."""
    param_specs = _spec_tree(state.params, spec_fn)
    param_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs)
    rep = NamedSharding(mesh, P())

    def mirror_opt(opt_state):
        # mu/nu inside ScaleByAdamState share the params treedef; replicate
        # everything else (counts, clip state, schedules)
        params_treedef = jax.tree_util.tree_structure(state.params)

        def map_node(node):
            try:
                if jax.tree_util.tree_structure(node) == params_treedef:
                    return param_sh
            except Exception:
                pass
            return None   # marker: recurse / replicate

        # walk the opt_state pytree manually
        def walk(node):
            mapped = map_node(node)
            if mapped is not None:
                return mapped
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*[walk(c) for c in node])
            if isinstance(node, (list, tuple)):
                return type(node)(walk(c) for c in node)
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return rep

        return walk(opt_state)

    frozen_sh = None
    if state.frozen is not None:
        frozen_sh = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            _spec_tree(state.frozen, frozen_spec_fn))
    return type(state)(
        step=rep,
        params=param_sh,
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        opt_state=mirror_opt(state.opt_state),
        frozen=frozen_sh,
    )


def shard_state(state, mesh: Mesh, spec_fn=fastspeech2_param_spec,
                frozen_spec_fn=frozen_spec):
    sh = state_shardings(state, mesh, spec_fn, frozen_spec_fn)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(np.asarray(x) if not hasattr(x, "sharding")
                                    else x, s),
        state, sh)


def make_tp_train_step(system, mesh: Mesh, spec_fn=fastspeech2_param_spec,
                       example_state=None, frozen_spec_fn=frozen_spec):
    """jit the train step with TP param shardings + DP batch sharding."""
    assert example_state is not None, "pass example_state for shardings"
    st_sh = state_shardings(example_state, mesh, spec_fn, frozen_spec_fn)
    bsh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        lambda state, batch, rng: system.train_step(state, batch, rng),
        in_shardings=(st_sh, bsh, rep),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,),
    )
