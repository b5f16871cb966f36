"""Profile the frozen hubert-large forward (the SSL upstream) on the TPU.

The upstream forward sits in the hot path of every SSL flow: FSCL meta
episodes, PR protonet episodes + transcription, unit discovery, and
adaptation support-set extraction. The round-4 protonet transcription
bench (benchmarks/bench_t2u_pr.py run_pr) measured ~14.5k frames/s =
~10 TFLOP/s effective through a ~197 TFLOP/s chip — this script answers
where the time actually goes (conv feature extractor vs transformer scan
vs layout/copy overhead) by capturing a device trace of 10 forwards and
parsing it with profile_train_step.report.

Reference role: the frozen `S3PRLExtractor` forward
(/root/reference/lightning/systems/plugin/ssl.py) — torch eager, one
Python hop per layer.

Usage: python benchmarks/profile_upstream.py [trace_dir] [B] [wav_s]
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_train_step import report  # noqa: E402

N_STEPS = 10


def capture(log_dir: str, B: int = 8, wav_s: float = 4.0) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    from fscl_tpu.core.config import UpstreamConfig
    from fscl_tpu.models.hubert import (adapt_layer_layout,
                                        frozen_upstream_features,
                                        make_upstream, storage_cast)

    cfg = UpstreamConfig(scan_layers=True, compute_dtype="bfloat16")
    upstream = make_upstream("hubert_large_ll60k", cfg)
    T = int(wav_s * 16000)
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(B, T)).astype(np.float32) * 0.1
    variables = upstream.init(jax.random.PRNGKey(0), jnp.zeros((1, 4000)))
    variables = adapt_layer_layout(upstream, variables)
    # bf16-resident frozen params, matching what every system now stores
    # (hubert.storage_cast): the first profile of this script showed the
    # per-call f32->bf16 cast costing ~1.8 ms/forward
    variables = storage_cast(variables, "bfloat16")

    @jax.jit
    def fwd(params, wavs, wav_valid):
        hidden, valid = frozen_upstream_features(
            upstream, params, wavs, wav_valid, compute_dtype="bfloat16")
        return hidden, valid

    dw = jnp.asarray(wav)
    dv = jnp.ones((B, T), bool)
    hidden, _ = fwd(variables, dw, dv)
    jax.block_until_ready(hidden)
    print(f"compiled; hidden {hidden.shape} {hidden.dtype}; tracing...",
          flush=True)
    jax.profiler.start_trace(log_dir)
    for _ in range(N_STEPS):
        hidden, _ = fwd(variables, dw, dv)
    jax.block_until_ready(hidden)
    jax.profiler.stop_trace()

    import time
    t0 = time.time()
    for _ in range(N_STEPS):
        hidden, _ = fwd(variables, dw, dv)
    jax.block_until_ready(hidden)
    dt = time.time() - t0
    print(f"wall: {dt / N_STEPS * 1e3:.1f} ms/forward "
          f"({B * hidden.shape[1] * N_STEPS / dt:.0f} frames/s)", flush=True)


def main():
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/upstream_trace_r4"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    wav_s = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    if not glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True):
        capture(log_dir, B, wav_s)
    out = report(log_dir)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profile_upstream_r4.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
