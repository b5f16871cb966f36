"""Full-size training-step throughput: f32 vs bf16-activation policy.

Round-1 finding (BASELINE.md): training runs at 19 TFLOP/s vs 87 on
inference because the backward pass is HBM-bound in elementwise VJPs.
This probe A/Bs ModelConfig.compute_dtype="bfloat16" (matmul/conv
computation + saved activations in bf16, params and norms f32) against the
f32 default IN ONE PROCESS (fresh processes wedge the tunnel; see memory).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(compute_dtype: str, B=16, L=128, T=512, iters=30,
            steps_per_dispatch=1):
    import dataclasses

    import jax

    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.systems.baseline import BaselineSystem

    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000)
    cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    system = BaselineSystem(cfg, OptimConfig(batch_size=B), (("en", 361),))
    rng = np.random.default_rng(0)

    def mk(seed):
        r = np.random.default_rng(seed)
        dur = r.integers(1, 5, (B, L)).astype(np.int32)
        return Batch(
            (np.arange(B) % 64).astype(np.int32),
            r.integers(1, 361, (B, L)).astype(np.int32),
            np.full((B,), L, np.int32),
            r.normal(size=(B, T, 80)).astype(np.float32),
            np.minimum(dur.sum(1), T).astype(np.int32),
            r.normal(size=(B, L)).astype(np.float32),
            r.normal(size=(B, L)).astype(np.float32),
            dur, np.zeros((B,), np.int32))

    batch = mk(0)
    state = system.init_state(jax.random.PRNGKey(0), batch)
    k = steps_per_dispatch
    if k > 1:
        # production trainer mode (TrainConfig.steps_per_dispatch): k
        # optimizer steps scanned inside one jitted program — same math as
        # k single dispatches, equal within atol=5e-4 fusion noise
        # (tests/test_trainer_multistep.py), amortizes
        # the ~1.3 ms per-dispatch tunnel gap (BASELINE.md r4 profile)
        from fscl_tpu.train.trainer import (make_multi_train_step,
                                            stack_batches)
        step = make_multi_train_step(system, k)
        batch = stack_batches([mk(i) for i in range(k)])
    else:
        step = jax.jit(system.train_step, donate_argnums=(0,))
    # pre-place the batch and base key once: the loop must issue NO per-step
    # host ops (uploads / eager PRNG) — on the tunneled chip those cost more
    # than the 15 ms device step itself (round-2 profiler)
    batch = jax.device_put(batch)
    key = jax.device_put(jax.random.PRNGKey(1))
    t0 = time.time()
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["Total Loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["Total Loss"])
    dt = time.time() - t0
    return {
        "compute_dtype": compute_dtype,
        "steps_per_dispatch": k,
        "steps_per_sec": round(iters * k / dt, 2),
        "ms_per_step": round(dt / (iters * k) * 1000, 2),
        "compile_s": round(compile_s, 1),
        "loss": float(metrics["Total Loss"]),
    }


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    # an argv dtype measures ONE configuration (one fresh process per
    # config is the only trustworthy protocol on the tunneled chip —
    # BASELINE.md measurement pitfalls); no argv = both in-process
    dtypes = (sys.argv[1:] if len(sys.argv) > 1
              else ("float32", "bfloat16"))
    for dtype in dtypes:
        r = measure(dtype)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
