"""Throughput probe: wholesale bf16 params+inputs vs f32 on the synthesis
path — decides whether a real mixed-precision policy is worth threading
through the modules (v5e bf16 peak ~2x the f32-in default-precision path).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=8, L=128, T=512, iters=50):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    import jax.numpy as jnp

    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.systems.baseline import BaselineSystem

    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000)
    system = BaselineSystem(cfg, OptimConfig(), (("en", 361),))
    rng = np.random.default_rng(0)
    texts = rng.integers(1, 361, (B, L)).astype(np.int32)
    dur = rng.integers(1, 6, (B, L)).astype(np.int32)
    batch = Batch(
        (np.arange(B) % 64).astype(np.int32), texts,
        np.full((B,), L, np.int32),
        rng.normal(size=(B, T, 80)).astype(np.float32),
        np.minimum(dur.sum(1), T).astype(np.int32),
        rng.normal(size=(B, L)).astype(np.float32),
        rng.normal(size=(B, L)).astype(np.float32),
        dur, np.zeros((B,), np.int32))
    state = system.init_state(jax.random.PRNGKey(0), batch)

    results = {}
    for tag, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "astype") else x,
            state.params)

        def synth(t, s, sp, lg):
            out = system.synthesize(params, state.batch_stats, t, s, T, sp, lg)
            return out.postnet_mel, out.mel_len

        fn = jax.jit(synth)
        args = (jnp.asarray(texts), jnp.asarray(batch.src_lens),
                jnp.asarray(batch.speaker_args), jnp.asarray(batch.lang_ids))
        mel, mel_len = fn(*args)
        jax.block_until_ready(mel)
        t0 = time.time()
        for _ in range(iters):
            mel, mel_len = fn(*args)
        jax.block_until_ready(mel)
        dt = (time.time() - t0) / iters
        results[tag] = dt * 1e3
        print(f"{tag}: {dt * 1e3:.3f} ms/call", flush=True)

    print(json.dumps({
        "metric": "bf16_speedup_synthesis",
        "value": round(results["f32"] / results["bf16"], 3),
        "unit": "x",
        "f32_ms": round(results["f32"], 3),
        "bf16_ms": round(results["bf16"], 3),
    }))


if __name__ == "__main__":
    main()
