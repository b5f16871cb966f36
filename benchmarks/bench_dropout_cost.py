"""Threaded-state A/B: full train step with vs without dropout masks.

The threaded-state loop (state_{i+1} = step(state_i)) is the only timing
pattern the axon tunnel reports faithfully (identical-args loops pipeline/
cache; see BASELINE.md notes). train=False keeps every other op identical —
the delta is the cost of generating + applying + saving ~42M threefry
dropout masks per step.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=16, L=128, T=512, iters=30):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.base import apply_grads

    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000)
    system = BaselineSystem(cfg, OptimConfig(batch_size=B), (("en", 361),))
    rng = np.random.default_rng(0)
    dur = rng.integers(1, 5, (B, L)).astype(np.int32)
    batch = Batch(
        (np.arange(B) % 64).astype(np.int32),
        rng.integers(1, 361, (B, L)).astype(np.int32),
        np.full((B,), L, np.int32),
        rng.normal(size=(B, T, 80)).astype(np.float32),
        np.minimum(dur.sum(1), T).astype(np.int32),
        rng.normal(size=(B, L)).astype(np.float32),
        rng.normal(size=(B, L)).astype(np.float32),
        dur, np.zeros((B,), np.int32))
    state0 = system.init_state(jax.random.PRNGKey(0), batch)

    def make_step(train_flag):
        def step(state, b, key):
            grad_fn = jax.value_and_grad(system.loss_and_metrics,
                                         has_aux=True)
            (loss, (metrics, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, b, key, train_flag)
            state = apply_grads(state, grads, system.tx, new_bs)
            return state, metrics
        return jax.jit(step, donate_argnums=(0,))

    for name, flag in (("dropout_on", True), ("dropout_off", False)):
        step = make_step(flag)
        state = jax.tree_util.tree_map(lambda x: x.copy(), state0)
        state, m = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m["Total Loss"])
        t0 = time.time()
        for i in range(iters):
            state, m = step(state, batch, jax.random.PRNGKey(i + 2))
        jax.block_until_ready(m["Total Loss"])
        dt = time.time() - t0
        print(json.dumps({
            "probe": name,
            "steps_per_sec": round(iters / dt, 2),
            "ms_per_step": round(dt / iters * 1000, 1)}), flush=True)


if __name__ == "__main__":
    main()
