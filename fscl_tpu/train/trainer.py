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


def make_multi_train_step(system: System, k: int,
                          mesh: Optional[Mesh] = None) -> Callable:
    """k optimizer steps per dispatch: `lax.scan` the train step over k
    batches stacked on a leading axis, inside ONE jitted program.

    Classic TPU infeed amortization — the per-dispatch host/tunnel gap
    (~1.3 ms on a tunneled v5e, BASELINE.md round-4 profile) is paid once
    per k steps instead of per step. The scan body is exactly
    `system.train_step`, and the base RNG key is passed unchanged (the
    step folds `state.step` into it on device), so k scanned steps are
    the same math as k single dispatches — identical trajectories up to
    compilation-variant fusion noise (~1e-8 abs; the scan body fuses
    differently than the standalone jit — Adam's normalized update can
    amplify this on near-cancelling gradients, see
    tests/test_trainer_multistep.py). Returns (state, last-step
    metrics) — the same contract as the single-step fn at a log boundary.
    """
    def multi(state, batches, rng):
        def body(st, batch):
            st, m = system.train_step(st, batch, rng)
            return st, m
        state, ms = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    if mesh is not None:
        rep = replicated(mesh)
        # stacked leaves are (k, B, ...): scan axis replicated, batch
        # axis sharded over `data`
        kbsh = NamedSharding(mesh, P(None, DATA_AXIS))
        return jax.jit(multi, in_shardings=(rep, kbsh, rep),
                       out_shardings=(rep, rep), donate_argnums=(0,))
    return jax.jit(multi, donate_argnums=(0,))


def stack_batches(batches):
    """Stack a list of identically-shaped batch pytrees on a new leading
    axis (the scan axis for make_multi_train_step)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def _group_stacked(iterator, k: int, limit: int, lead: int = 0):
    """Tag a batch stream for the fit loop: `lead` single batches first
    (so k-groups start on a step multiple of k after resume), then
    ('multi', k, stacked) while >= k steps remain under `limit`, then
    singles for the tail / a source that dries up mid-group."""
    remaining = limit
    buf = []
    for b in iterator:
        if remaining <= 0:
            break
        if lead > 0:
            lead -= 1
            remaining -= 1
            yield ("single", 1, b)
            continue
        if remaining >= k:
            buf.append(b)
            if len(buf) == k:
                yield ("multi", k, stack_batches(buf))
                buf = []
                remaining -= k
        else:
            remaining -= 1
            yield ("single", 1, b)
    for b in buf[: max(remaining, 0)]:
        yield ("single", 1, b)


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
        self._multi_step = None
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

        step = int(state.step)
        k = getattr(self.cfg, "steps_per_dispatch", 1)
        if k > 1:
            for name in ("log_step", "val_step", "synth_step", "save_step"):
                cadence = getattr(self.cfg, name, 10 ** 9)
                # user-config validation must survive `python -O` (which
                # strips asserts): a misaligned cadence would silently
                # never fire log/val/SAVE boundaries since step advances
                # by k per dispatch
                if not (cadence % k == 0 or cadence >= 10 ** 9):
                    raise ValueError(
                        f"steps_per_dispatch={k} requires {name}={cadence} "
                        f"to be a multiple of k (cadence fires at dispatch "
                        f"boundaries)")
            if self._multi_step is None:
                self._multi_step = make_multi_train_step(
                    self.system, k, self.mesh)
            train_iter = _group_stacked(train_iter, k, max_steps - step,
                                        lead=(-step) % k)
        else:
            train_iter = (("single", 1, b) for b in train_iter)

        if self.mesh is not None:
            multi_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def place_item(item):
            tag, n, b = item
            if self.mesh is not None:
                sh = multi_sh if tag == "multi" else batch_sharding(self.mesh)
                b = jax.tree_util.tree_map(
                    lambda x: jax.device_put(np.asarray(x), sh), b)
            else:
                b = jax.device_put(b)
            return (tag, n, b)

        prefetch = getattr(self.cfg, "prefetch", 0)
        if prefetch > 0:
            train_iter = prefetch_batches(train_iter, size=prefetch,
                                          place=place_item)
        metrics = None
        t_log = time.time()
        # the base key is passed UNCHANGED every step (train_step folds in
        # state.step on-device); keeping it device-resident means the loop
        # issues zero per-step host RNG ops — on a tunneled TPU the eager
        # split() alone cost ~6 ms/step (round-2 profiler)
        rng = jax.device_put(rng)
        for item in train_iter:
            if step >= max_steps:
                break
            sub = rng
            if self.profile:
                with self.timer.phase("place_batch"):
                    if prefetch == 0:
                        item = place_item(item)
                tag, n, batch = item
                fn = self._multi_step if tag == "multi" else train_step
                with self.timer.phase("train_step",
                                      block_on=state.step):
                    state, metrics = fn(state, batch, sub)
            else:
                if prefetch == 0:
                    # explicit placement even single-device: feeding numpy
                    # straight into the jitted step degrades long loops
                    # through the tunneled runtime (BASELINE.md round 2)
                    item = place_item(item)
                tag, n, batch = item
                fn = self._multi_step if tag == "multi" else train_step
                state, metrics = fn(state, batch, sub)
            step += n

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
