"""System base: pure train/eval step functions + pytree state.

Replaces the reference's LightningModule template-method contract
(lightning/systems/system.py:38-52 build_configs/build_model/
build_optimized_model/build_saver) with a functional design: a System owns
flax module definitions and exposes jittable `train_step`/`eval_step`
closures over a `TrainState` pytree. The `trainable_mask` hook is the
equivalent of `build_optimized_model` — parameters outside the mask get no
updates (frozen upstream, frozen u2s, etc.).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from fscl_tpu.core.config import OptimConfig
from fscl_tpu.train.optim import make_optimizer


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # Non-optimized parameter collections (e.g. the frozen SSL upstream).
    # Threaded through train/eval steps as a RUNTIME argument: closing over
    # a 300M-param pytree instead bakes it into the jitted program as
    # literal constants (a multi-GB HLO that breaks remote compilation and
    # defeats donation). Stripped from checkpoints like the reference
    # strips frozen upstream weights on save (TransEmbOrig.py:156-166).
    frozen: Any = None

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_state(
    variables: Dict[str, Any],
    tx: optax.GradientTransformation,
) -> Tuple[TrainState, optax.GradientTransformation]:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats"),
        opt_state=tx.init(params),
        frozen=variables.get("frozen"),
    ), tx


def apply_grads(state: TrainState, grads, tx, new_batch_stats=None) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        batch_stats=(new_batch_stats if new_batch_stats is not None
                     else state.batch_stats),
    )


def jit_init(module, *, static_argnums=()):
    """`module.init` under jax.jit. An eager flax init dispatches one tiny
    device op per parameter — measured 149 s for the 300M-param FSCL meta
    system over a tunneled chip (round-3 rehearsal breakdown) — where one
    compiled program materializes every tensor device-side in seconds (and
    the executable lands in the persistent compile cache). Init runs once
    per process, so the wrapper is built per call."""
    return jax.jit(module.init, static_argnums=static_argnums)


def jit_frozen_extract(extract_fn, upstream_params, *args):
    """Run a system's `extract_ssl`-style frozen forward under jit with the
    upstream weights as a TRACED argument (closure capture would bake them
    into the HLO as constants — the remote-compile wedge fixed in
    tune.build_reference_table). For one-off init/eval-time extractions
    outside a jitted train step."""
    return jax.jit(
        lambda up, *a: extract_fn(*a, up))(upstream_params, *args)


class System:
    """Base class. Subclasses set up modules in __init__ and implement
    init_state / loss_fn; train_step/eval_step come for free."""

    def __init__(self, optim_cfg: OptimConfig):
        self.optim_cfg = optim_cfg
        self._tx: Optional[optax.GradientTransformation] = None

    # --- to implement -----------------------------------------------------
    def init_variables(self, rng, batch) -> Dict[str, Any]:
        raise NotImplementedError

    def loss_and_metrics(self, params, batch_stats, batch, rng, train: bool,
                         frozen=None):
        """Return (loss, (metrics_dict, new_batch_stats)). `frozen` carries
        non-optimized collections from TrainState.frozen (None for systems
        without them)."""
        raise NotImplementedError

    def trainable_mask(self, params):
        """Pytree of bools over params; default: everything trainable."""
        return jax.tree_util.tree_map(lambda _: True, params)

    # --- provided ----------------------------------------------------------
    def init_state(self, rng, batch) -> TrainState:
        variables = self.init_variables(rng, batch)
        self._tx = make_optimizer(
            self.optim_cfg, self.trainable_mask(variables["params"]))
        state, _ = create_state(variables, self._tx)
        return state

    @property
    def tx(self):
        assert self._tx is not None, "call init_state first"
        return self._tx

    def train_step(self, state: TrainState, batch, rng):
        # rng is a BASE key, folded with the step counter INSIDE the jitted
        # program: callers pass the same device-resident key every step, so
        # the loop issues no per-step host RNG ops (on a tunneled TPU the
        # eager PRNGKey+split cost ~6 ms/step — measured via profiler r2).
        key = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(self.loss_and_metrics, has_aux=True)
        (loss, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, key, True, state.frozen)
        state = apply_grads(state, grads, self.tx, new_bs)
        return state, metrics

    def eval_step(self, state: TrainState, batch, rng):
        _, (metrics, _) = self.loss_and_metrics(
            state.params, state.batch_stats, batch, rng, False, state.frozen)
        return metrics
