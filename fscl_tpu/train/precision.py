"""Mixed-precision helpers.

TPU MXU natively computes bf16; a selective cast of the big matmul/conv
weights to bf16 (keeping norm parameters and the optimizer master copy in
f32) trades negligible quality for HBM bandwidth and MXU throughput.
`bench_bf16_probe.py` measures whether the current model shape benefits.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

_NORM_KEYS = ("layer_norm", "bn_", "norm", "scale")


def _is_norm_path(path) -> bool:
    keys = [str(getattr(k, "key", k)) for k in path]
    joined = "/".join(keys)
    return any(tok in joined for tok in ("layer_norm", "feat_layer_norm")) or \
        any(k.startswith("bn_") or k in ("ln1", "ln2") for k in keys)


def cast_params_bf16(params: Any) -> Any:
    """Cast floating params to bf16 except norm-layer parameters (kept f32
    for numerical stability). Integer / PRNG leaves untouched."""

    def cast(path, x):
        if not hasattr(x, "dtype") or not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        if _is_norm_path(path):
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)


def cast_floating(tree: Any, dtype) -> Any:
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree)
