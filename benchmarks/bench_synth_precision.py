"""Synthesis precision A/B: f32 vs bf16 activation policy.

The headline synthesis bench runs f32. This probe measures the same
no-target synthesis pass with ModelConfig.compute_dtype="bfloat16"
(matmul/conv computation in bf16, f32 params/norms) and reports the
mel divergence vs the f32 output of the SAME weights, so a faster
default is only adopted with a quantified quality cost.

Usage: python benchmarks/bench_synth_precision.py [float32|bfloat16|both]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(compute_dtype: str, B=8, L=128, T=512):
    import jax

    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.systems.baseline import BaselineSystem

    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000)
    cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    system = BaselineSystem(cfg, OptimConfig(), (("en", 361),))
    rng = np.random.default_rng(0)
    texts = rng.integers(1, 361, (B, L)).astype(np.int32)
    dur = rng.integers(1, 6, (B, L)).astype(np.int32)
    batch = Batch((np.arange(B) % 64).astype(np.int32), texts,
                  np.full((B,), L, np.int32),
                  rng.normal(size=(B, T, 80)).astype(np.float32),
                  np.minimum(dur.sum(1), T).astype(np.int32),
                  rng.normal(size=(B, L)).astype(np.float32),
                  rng.normal(size=(B, L)).astype(np.float32),
                  dur, np.zeros((B,), np.int32))
    # identical init across dtypes: params are created f32 either way
    state = system.init_state(jax.random.PRNGKey(0), batch)
    return system, state, batch, T


def measure(compute_dtype: str, iters=50):
    import jax
    import jax.numpy as jnp

    system, state, batch, T = _build(compute_dtype)
    params, bs = state.params, state.batch_stats
    from bench import pin_realistic_durations
    params = pin_realistic_durations(params)

    @jax.jit
    def synth(t, s, sp, lg):
        out = system.synthesize(params, bs, t, s, T, sp, lg)
        return out.postnet_mel, out.mel_len

    args = (jnp.asarray(batch.texts), jnp.asarray(batch.src_lens),
            jnp.asarray(batch.speaker_args), jnp.asarray(batch.lang_ids))
    mel, mel_len = synth(*args)
    jax.block_until_ready(mel)
    _ = float(jnp.sum(mel_len))          # absorb first-readback warm-up
    t0 = time.time()
    for _ in range(iters):
        mel, mel_len = synth(*args)
    jax.block_until_ready(mel)
    dt = time.time() - t0
    frames = int(np.asarray(mel_len).sum()) * iters
    return {"compute_dtype": compute_dtype,
            "mel_frames_per_sec": round(frames / dt, 1),
            "mel": np.asarray(mel), "mel_len": np.asarray(mel_len)}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    results = []
    for dtype in (("float32", "bfloat16") if which == "both" else (which,)):
        results.append(measure(dtype))
    if len(results) == 2 and results[0]["mel_len"].shape == \
            results[1]["mel_len"].shape:
        a, b = results
        same_len = bool((a["mel_len"] == b["mel_len"]).all())
        # masked mean-abs mel divergence over predicted frames
        T = a["mel"].shape[1]
        mask = (np.arange(T)[None, :] <
                np.minimum(a["mel_len"], b["mel_len"])[:, None])
        diff = np.abs(a["mel"] - b["mel"])[mask].mean() if mask.any() else 0.0
        extra = {"same_mel_len": same_len,
                 "mean_abs_mel_diff": round(float(diff), 4)}
    else:
        extra = {}
    for r in results:
        rec = {k: v for k, v in r.items() if k not in ("mel", "mel_len")}
        rec.update(extra)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
