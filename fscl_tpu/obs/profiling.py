"""Profiling / tracing.

TPU equivalent of the reference's always-on Lightning `profiler: 'simple'`
(main.py:39) + CUDA_LAUNCH_BLOCKING debugging (Define.py:8-9): jax.profiler
traces viewable in Perfetto/TensorBoard, plus a lightweight per-phase wall
timer for the train loop.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Simple-profiler-style accumulated wall times per phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["Phase timing (total s | calls | mean ms):"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            n = self.counts[name]
            lines.append(
                f"  {name:30s} {total:9.3f} | {n:6d} | {total / n * 1e3:9.2f}")
        return "\n".join(lines)
