"""Adaptation-throughput stability (VERDICT r2 #10).

Round-2 found `adapt_many` readings vary up to ~40% between tunnel runs.
This driver measures each configuration in N FRESH SUBPROCESSES (the only
trustworthy protocol on the tunneled chip — same-process repeats degrade,
BASELINE.md round-2 pitfalls) and reports median +- spread, so BASELINE.md
can carry defensible numbers and a recommended multi-task configuration.

Usage: python benchmarks/bench_adapt_stability.py [n_repeats]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
from fscl_tpu.data.batch import Batch
from fscl_tpu.systems.baseline import BaselineSystem
from fscl_tpu.systems.tune import adapt_many_on_chip, adapt_on_chip

n_tasks = {n_tasks}
n_steps = {n_steps}
B, L, T = 4, {L}, {T}
cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000)
system = BaselineSystem(cfg, OptimConfig(), (("en", 361),))
rng = np.random.default_rng(0)

def make_batch():
    dur = rng.integers(1, 5, (B, L)).astype(np.int32)
    return Batch(
        (np.arange(B) % 64).astype(np.int32),
        rng.integers(1, 361, (B, L)).astype(np.int32),
        np.full((B,), L, np.int32),
        rng.normal(size=(B, T, 80)).astype(np.float32),
        np.minimum(dur.sum(1), T).astype(np.int32),
        rng.normal(size=(B, L)).astype(np.float32),
        rng.normal(size=(B, L)).astype(np.float32),
        dur, np.zeros((B,), np.int32))

state = system.init_state(jax.random.PRNGKey(0), make_batch())
if n_tasks == 1:
    batches = [make_batch() for _ in range(n_steps)]
    # warm (compile)
    p, losses = adapt_on_chip(system, state.params, state.batch_stats,
                              batches, lr=1e-4)
    jax.block_until_ready(losses)
    t0 = time.time()
    p, losses = adapt_on_chip(system, state.params, state.batch_stats,
                              batches, lr=1e-4)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    agg = n_steps / dt
else:
    tasks = [[make_batch() for _ in range(n_steps)] for _ in range(n_tasks)]
    p, losses = adapt_many_on_chip(system, state.params, state.batch_stats,
                                   tasks, lr=1e-4)
    jax.block_until_ready(losses)
    t0 = time.time()
    p, losses = adapt_many_on_chip(system, state.params, state.batch_stats,
                                   tasks, lr=1e-4)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    agg = n_tasks * n_steps / dt
print(json.dumps({{"n_tasks": n_tasks, "aggregate_steps_per_sec": agg}}))
"""


def run_once(n_tasks: int, timeout: int = 1800, n_steps: int = 100,
             L: int = 128, T: int = 512):
    code = _CHILD.format(repo=REPO, n_tasks=n_tasks, n_steps=n_steps,
                         L=L, T=T)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=timeout,
                          cwd=REPO)
    lines = [l for l in proc.stdout.strip().splitlines()
             if l.startswith("{")]
    if not lines:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(lines[-1])["aggregate_steps_per_sec"]


def main():
    n_repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {}
    # Two protocols, NOT one metric (this is the round-3 "2x disagreement"
    # between 524 and 1041 steps/s — different WORKLOADS, not noise):
    #   legacy stability shapes: L=128/T=512 per 4-shot step (100-step scan)
    #   canonical bench.py shapes (bench_adaptation): L=64/T=256, 200-step
    # The canonical row is what BENCH_rNN.json's adaptation metric reports.
    protocols = {
        "legacy_L128_T512": dict(n_steps=100, L=128, T=512, tasks=(1, 4)),
        "canonical_L64_T256": dict(n_steps=200, L=64, T=256, tasks=(1,)),
    }
    for name, p in protocols.items():
        for n_tasks in p["tasks"]:
            key = f"{name}/n_tasks={n_tasks}"
            vals = []
            for i in range(n_repeats):
                try:
                    v = run_once(n_tasks, n_steps=p["n_steps"], L=p["L"],
                                 T=p["T"])
                    vals.append(v)
                    print(f"{key} run {i}: {v:.1f} agg steps/s", flush=True)
                except Exception as e:
                    print(f"{key} run {i} FAILED: {str(e)[:200]}",
                          flush=True)
            if vals:
                out[key] = {
                    "median": float(np.median(vals)),
                    "min": float(np.min(vals)), "max": float(np.max(vals)),
                    "spread_pct": float(
                        100 * (np.max(vals) - np.min(vals))
                        / max(np.median(vals), 1e-9)),
                    "n": len(vals),
                }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
