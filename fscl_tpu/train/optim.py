"""Optimizer + LR schedule (optax).

Equivalent of lightning/optimizer.py:5-15 (Adam from train config) and
lightning/scheduler.py:5-60 (warmup then inverse-sqrt or constant, with
multiplicative anneal at milestone steps), plus global-norm gradient
clipping which the reference gets from Lightning's `gradient_clip_val`
(main.py:104-110).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import optax

from fscl_tpu.core.config import OptimConfig


def lr_schedule(cfg: OptimConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    warmup = cfg.warmup_step
    anneal_steps = jnp.asarray(cfg.anneal_steps or (0,), dtype=jnp.float32)
    has_anneal = bool(cfg.anneal_steps)
    rate = cfg.anneal_rate

    def schedule(step):
        current = step.astype(jnp.float32) + 1.0
        if warmup > 0:
            if cfg.scheduler == "sqrt":
                factor = jnp.where(
                    current <= warmup,
                    current / warmup,
                    jnp.sqrt(warmup / current),
                )
            else:  # const
                factor = jnp.minimum(current / warmup, 1.0)
        else:
            factor = jnp.ones_like(current)
        if has_anneal:
            n_annealed = jnp.sum(current > anneal_steps)
            factor = factor * (rate ** n_annealed)
        return cfg.lr * factor

    return schedule


def make_optimizer(cfg: OptimConfig, trainable_mask=None) -> optax.GradientTransformation:
    """Adam + warmup/anneal schedule + global-norm clipping.

    `trainable_mask` is a pytree-of-bools (or callable) selecting optimized
    params — the equivalent of the reference's `build_optimized_model`
    contract (system.py:38-52), where only returned submodules get gradients.
    """
    chain = [
        optax.clip_by_global_norm(cfg.grad_clip_thresh),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
    ]
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_learning_rate(lr_schedule(cfg)))
    tx = optax.chain(*chain)
    if cfg.grad_acc_step > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_acc_step)
    if trainable_mask is not None:
        # optax.masked alone lets unmasked grads pass through untouched —
        # frozen params must get ZERO updates, so chain a set_to_zero on the
        # complement mask.
        import jax

        inverse = jax.tree_util.tree_map(lambda b: not b, trainable_mask)
        tx = optax.chain(
            optax.masked(tx, trainable_mask),
            optax.masked(optax.set_to_zero(), inverse),
        )
    return tx
