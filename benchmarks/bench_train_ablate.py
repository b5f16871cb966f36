"""Ablate the full-size training step to locate the HBM-bound time.

Round-2 probe (VERDICT r1 weak #1): times, in one process,
- the jitted forward loss only,
- forward+backward WITHOUT dropout (deterministic),
- forward+backward with dropout but params NOT donated,
- the full train step (grads + adam + clip),
so the 67.5 ms/step (14.8 steps/s) decomposes into fwd / bwd / dropout-RNG
/ optimizer shares.
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
    state = system.init_state(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / iters * 1000
        print(json.dumps({"probe": name, "ms": round(ms, 1)}), flush=True)
        return ms

    # forward loss only (train-mode dropout active)
    @jax.jit
    def fwd_loss(params, batch_stats, rng):
        loss, _ = system.loss_and_metrics(params, batch_stats, batch, rng, True)
        return loss

    # forward loss, deterministic (no dropout masks at all)
    @jax.jit
    def fwd_loss_det(params, batch_stats, rng):
        loss, _ = system.loss_and_metrics(params, batch_stats, batch, rng, False)
        return loss

    @jax.jit
    def grad_only(params, batch_stats, rng):
        g = jax.grad(lambda p: system.loss_and_metrics(p, batch_stats, batch, rng,
                                                     True)[0])(params)
        return g

    @jax.jit
    def grad_det(params, batch_stats, rng):
        g = jax.grad(lambda p: system.loss_and_metrics(p, batch_stats, batch, rng,
                                                     False)[0])(params)
        return g

    step = jax.jit(system.train_step)

    timeit("fwd_train", fwd_loss, state.params, state.batch_stats, key)
    timeit("fwd_det", fwd_loss_det, state.params, state.batch_stats, key)
    timeit("fwd+bwd_train", grad_only, state.params, state.batch_stats, key)
    timeit("fwd+bwd_det", grad_det, state.params, state.batch_stats, key)
    timeit("full_step", lambda s: step(s, batch, key)[1]["Total Loss"],
           state)


if __name__ == "__main__":
    main()
