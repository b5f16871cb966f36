"""pjit training: data-parallel step over the device mesh + host loop.

TPU-native replacement for Lightning's Trainer/DDP (main.py:34-110): the
batch is sharded over the mesh's `data` axis, params/opt-state are
replicated, and XLA inserts the gradient all-reduce. The host loop keeps the
reference's step-based cadence semantics (log/val/synth/save every N steps,
train_config in core.config.TrainConfig).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fscl_tpu.core.config import TrainConfig
from fscl_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated
from fscl_tpu.systems.base import System, TrainState


def make_parallel_train_step(system: System, mesh: Mesh) -> Callable:
    """Jit the system's train_step with batch sharded over `data` and state
    replicated. Works for any batch pytree whose leaves lead with the batch
    dim."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step(state, batch, rng):
        return system.train_step(state, batch, rng)

    return jax.jit(
        step,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(system: System, mesh: Mesh) -> Callable:
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        lambda state, batch, rng: system.eval_step(state, batch, rng),
        in_shardings=(rep, bsh, rep),
        out_shardings=rep,
    )


def place_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x), sh), batch)


def prefetch_batches(iterator, size: int = 2, place=None):
    """Background-thread input pipeline: host collate (+ optional device
    placement) runs `size` batches ahead of the consumer, overlapping data
    prep with the device step. TPU-native replacement for the reference's
    DataLoader(num_workers=4) prefetching (main.py Lightning loaders) —
    here one thread suffices because collate is numpy-bound and device
    transfer releases the GIL. Exceptions in the producer re-raise at the
    consumer's next pull."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(size, 1))
    END = object()

    def worker():
        try:
            for b in iterator:
                q.put(place(b) if place is not None else b)
            q.put(END)
        except BaseException as e:  # propagate into the training loop
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class Trainer:
    """Step-based host loop (log/val/save cadence from TrainConfig)."""

    def __init__(
        self,
        system: System,
        train_cfg: TrainConfig,
        mesh: Optional[Mesh] = None,
        callbacks: Iterable = (),
        profile: bool = False,
    ):
        """`profile=True` accumulates per-phase wall times (the reference's
        always-on Lightning simple profiler, main.py:39) — report via
        `trainer.timer.report()`."""
        self.system = system
        self.cfg = train_cfg
        self.mesh = mesh
        self.callbacks = list(callbacks)
        self.profile = profile
        from fscl_tpu.obs.profiling import PhaseTimer
        self.timer = PhaseTimer()
        self._train_step = None
        self._eval_step = None

    def _lr_at(self, step: int) -> float:
        """Current learning rate (LearningRateMonitor parity, system.py:67)."""
        import jax.numpy as jnp

        from fscl_tpu.train.optim import lr_schedule
        try:
            return float(lr_schedule(self.system.optim_cfg)(jnp.asarray(step)))
        except Exception:
            return float("nan")

    def fit(
        self,
        state: TrainState,
        train_iter: Iterable,
        val_loader: Optional[Callable[[], Iterable]] = None,
        rng: Optional[jax.Array] = None,
        max_steps: Optional[int] = None,
    ) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        max_steps = max_steps or self.cfg.total_step
        # one jitted instance per Trainer, reused across fit() calls
        if self._train_step is None:
            if self.mesh is not None:
                self._train_step = make_parallel_train_step(
                    self.system, self.mesh)
            else:
                self._train_step = jax.jit(self.system.train_step,
                                           donate_argnums=(0,))
        train_step = self._train_step
        if val_loader and self._eval_step is None:
            self._eval_step = (make_parallel_eval_step(self.system, self.mesh)
                               if self.mesh is not None
                               else jax.jit(self.system.eval_step))
        eval_step = self._eval_step

        prefetch = getattr(self.cfg, "prefetch", 0)
        if prefetch > 0:
            place = ((lambda b: place_batch(b, self.mesh))
                     if self.mesh is not None else jax.device_put)
            train_iter = prefetch_batches(train_iter, size=prefetch,
                                          place=place)

        step = int(state.step)
        metrics = None
        t_log = time.time()
        # the base key is passed UNCHANGED every step (train_step folds in
        # state.step on-device); keeping it device-resident means the loop
        # issues zero per-step host RNG ops — on a tunneled TPU the eager
        # split() alone cost ~6 ms/step (round-2 profiler)
        rng = jax.device_put(rng)
        for batch in train_iter:
            if step >= max_steps:
                break
            sub = rng
            if self.profile:
                with self.timer.phase("place_batch"):
                    if prefetch == 0:
                        batch = (place_batch(batch, self.mesh)
                                 if self.mesh is not None
                                 else jax.device_put(batch))
                with self.timer.phase("train_step",
                                      block_on=state.step):
                    state, metrics = train_step(state, batch, sub)
            else:
                if prefetch == 0:
                    # explicit placement even single-device: feeding numpy
                    # straight into the jitted step degrades long loops
                    # through the tunneled runtime (BASELINE.md round 2)
                    batch = (place_batch(batch, self.mesh)
                             if self.mesh is not None
                             else jax.device_put(batch))
                state, metrics = train_step(state, batch, sub)
            step += 1

            if step % self.cfg.log_step == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["lr"] = self._lr_at(step)
                dt = time.time() - t_log
                t_log = time.time()
                for cb in self.callbacks:
                    cb.on_log(step, metrics, steps_per_sec=self.cfg.log_step / dt)

            if val_loader is not None and step % self.cfg.val_step == 0:
                agg: Dict[str, list] = {}
                first_vb = None
                for vb in val_loader():
                    if first_vb is None:
                        first_vb = vb
                    rng, sub = jax.random.split(rng)
                    if self.mesh is not None:
                        vb = place_batch(vb, self.mesh)
                    m = eval_step(state, vb, sub)
                    for k, v in m.items():
                        agg.setdefault(k, []).append(float(v))
                val_metrics = {k: float(np.mean(v)) for k, v in agg.items()}
                for cb in self.callbacks:
                    cb.on_validation(step, val_metrics)
                    # synth-artifact savers (baseline_saver synth_step path)
                    hook = getattr(cb, "on_validation_sample", None)
                    if hook is not None and first_vb is not None:
                        hook(step, state, first_vb)

            if step % self.cfg.save_step == 0:
                for cb in self.callbacks:
                    cb.on_save(step, state)
        # always emit the final step's metrics, so short smoke runs
        # (total_step < log_step) still produce a loss line
        if step % self.cfg.log_step != 0 and metrics is not None:
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["lr"] = self._lr_at(step)
            dt = max(time.time() - t_log, 1e-9)
            for cb in self.callbacks:
                cb.on_log(step, metrics,
                          steps_per_sec=(step % self.cfg.log_step) / dt)
        return state
