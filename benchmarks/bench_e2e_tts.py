"""End-to-end TTS serving benchmark: text -> mel -> wav in one XLA program.

Measures the fused serving pipeline (audio_out/pipeline.py:make_text2wav:
FastSpeech2 synthesis + HiFiGAN V1 vocoder) on the chip and reports
audio-seconds generated per wall-second (realtime factor per chip) plus
wav samples/s. The reference serves this in two torch hops
(lightning/utils/log.py synth_samples + dlhlp vocoder infer); here both
models compile into ONE program so the mel never materializes off-chip.

Duration head pinned to realistic speech lengths
(bench.py:pin_realistic_durations) — same policy as the headline
synthesis bench.

Usage: python benchmarks/bench_e2e_tts.py [iters] [float32|bfloat16|both]
                                          [conv_transpose|subpixel]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(voc_dtype: str = "float32", iters: int = 20,
        upsample: str = "conv_transpose"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    from bench import pin_realistic_durations
    from fscl_tpu.audio_out.pipeline import make_text2wav
    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.models.hifigan import HiFiGANGenerator
    from fscl_tpu.systems.baseline import BaselineSystem

    B, L, T = 8, 128, 512
    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000)
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
    state = system.init_state(jax.random.PRNGKey(0), batch)
    state = state.replace(params=pin_realistic_durations(state.params))

    voc = HiFiGANGenerator(
        n_mels=cfg.audio.n_mels,
        dtype=jnp.bfloat16 if voc_dtype == "bfloat16" else None,
        upsample_impl=upsample)
    # init at f32 regardless: params are dtype-independent
    voc_vars = HiFiGANGenerator(n_mels=cfg.audio.n_mels).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, cfg.audio.n_mels)))

    text2wav = make_text2wav(system, state, voc, voc_vars, T)
    args = (jnp.asarray(texts), jnp.asarray(np.full((B,), L, np.int32)),
            jnp.asarray(batch.speaker_args), jnp.asarray(batch.lang_ids))

    t0 = time.time()
    wav, mel_len = text2wav(*args)
    jax.block_until_ready(wav)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        wav, mel_len = text2wav(*args)
    jax.block_until_ready(wav)
    dt = time.time() - t0

    hop = cfg.audio.hop_length
    sr = cfg.audio.sampling_rate
    n_samples = int(np.asarray(mel_len).sum()) * hop * iters
    audio_s = n_samples / sr
    rec = {
        "metric": "e2e_tts_realtime_factor_per_chip",
        "value": round(audio_s / dt, 1),
        "unit": "x realtime",
        "vocoder_dtype": voc_dtype,
        "upsample_impl": upsample,
        "wav_samples_per_sec": round(n_samples / dt, 1),
        "ms_per_batch": round(dt / iters * 1e3, 2),
        "batch": B, "text_len": L, "mel_bucket": T,
        "hop": hop, "sampling_rate": sr,
        "compile_s": round(compile_s, 1),
        "vs_baseline": None,
    }
    print(json.dumps(rec))
    rec["wav"] = np.asarray(wav)
    rec["mel_len"] = np.asarray(mel_len)
    return rec


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    which = sys.argv[2] if len(sys.argv) > 2 else "float32"
    upsample = sys.argv[3] if len(sys.argv) > 3 else "conv_transpose"
    if which != "both":
        run(which, iters, upsample)
        return
    a = run("float32", iters, upsample)
    b = run("bfloat16", iters, upsample)
    # waveform divergence over the valid samples (tanh-bounded [-1, 1])
    n = int(min(a["mel_len"].min(), b["mel_len"].min())) * a["hop"]
    diff = np.abs(a["wav"][:, :n] - b["wav"][:, :n])
    print(json.dumps({
        "metric": "vocoder_bf16_waveform_divergence",
        "mean_abs": round(float(diff.mean()), 6),
        "max_abs": round(float(diff.max()), 6),
        "speedup": round(a["ms_per_batch"] / b["ms_per_batch"], 2),
    }))


if __name__ == "__main__":
    main()
