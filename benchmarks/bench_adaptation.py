"""Secondary benchmark: few-shot adaptation inner-loop steps/sec.

North-star metric (BASELINE.json): on-chip lax.scan MAML/tune loops. Runs
`adapt_on_chip` (one lax.scan over K SGD steps, no host round-trips) on the
full-size FastSpeech2 with a 4-shot batch and reports steps/sec, plus the
equivalent host-loop rate for contrast.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_steps: int = 200, B: int = 4, L: int = 64, T: int = 256,
         emit: bool = True):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    import jax.numpy as jnp

    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.tune import adapt_on_chip

    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=8), max_seq_len=512)
    system = BaselineSystem(cfg, OptimConfig(), (("ko", 100),))
    rng = np.random.default_rng(0)
    dur = rng.integers(1, 5, (B, L)).astype(np.int32)

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
    batches = [mk(i) for i in range(n_steps)]

    # warm-up compile with the SAME scan length, then time the cached run
    adapted, losses = adapt_on_chip(
        system, state.params, state.batch_stats, batches, lr=1e-4)
    jax.block_until_ready(losses)

    t0 = time.time()
    adapted, losses = adapt_on_chip(
        system, state.params, state.batch_stats, batches, lr=1e-4)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    result = {
        "metric": "few_shot_adaptation_inner_loop_steps_per_sec",
        "value": round(n_steps / dt, 1),
        "unit": "steps/s",
        "n_steps": n_steps,
        "loss_first": float(np.asarray(losses)[0]),
        "loss_last": float(np.asarray(losses)[-1]),
    }
    if emit:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
