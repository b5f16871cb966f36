"""Task-parallel few-shot adaptation throughput (vmapped inner loops).

The reference adapts test tasks one at a time (1 task per GPU process,
lightning/systems/adaptor.py:21-24); a single 4-shot task cannot fill the
MXU. `adapt_many_on_chip` vmaps the on-chip adaptation scan over a task
axis, so one chip adapts N tasks simultaneously — this measures the
aggregate inner-loop steps/s scaling in N.

Usage: python benchmarks/bench_adapt_many.py [n_tasks ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n_tasks: int, n_steps: int = 100, B: int = 4, L: int = 64,
        T: int = 256):
    import jax

    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.tune import adapt_many_on_chip

    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=8), max_seq_len=512)
    system = BaselineSystem(cfg, OptimConfig(), (("ko", 100),))
    base = np.random.default_rng(0)
    dur = base.integers(1, 5, (B, L)).astype(np.int32)

    def mk(seed):
        r = np.random.default_rng(seed)
        return Batch(
            speaker_args=np.zeros(B, np.int32),
            texts=r.integers(1, 100, (B, L)).astype(np.int32),
            src_lens=np.full((B,), L, np.int32),
            mels=r.normal(size=(B, T, 80)).astype(np.float32),
            mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
            pitches=r.normal(size=(B, L)).astype(np.float32),
            energies=r.normal(size=(B, L)).astype(np.float32),
            durations=dur, lang_ids=np.zeros(B, np.int32))

    state = system.init_state(jax.random.PRNGKey(0), mk(0))
    tasks = [[mk(1000 * t + i) for i in range(n_steps)]
             for t in range(n_tasks)]

    # compile + timed run (same scan length)
    _, losses = adapt_many_on_chip(
        system, state.params, state.batch_stats, tasks, lr=1e-4)
    jax.block_until_ready(losses)
    t0 = time.time()
    _, losses = adapt_many_on_chip(
        system, state.params, state.batch_stats, tasks, lr=1e-4)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    return {
        "n_tasks": n_tasks,
        "aggregate_steps_per_sec": round(n_tasks * n_steps / dt, 1),
        "wall_s_for_100_steps": round(dt, 3),
        "loss_last_mean": float(np.asarray(losses)[:, -1].mean()),
    }


def main(task_counts=(1, 2, 4, 8, 16), emit: bool = True):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rows = [run(n) for n in task_counts]
    result = {
        "metric": "few_shot_adaptation_task_parallel_steps_per_sec",
        "unit": "aggregate steps/s",
        "rows": rows,
        "value": rows[-1]["aggregate_steps_per_sec"],
    }
    if emit:
        print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    counts = tuple(int(a) for a in sys.argv[1:]) or (1, 2, 4, 8, 16)
    main(counts)
