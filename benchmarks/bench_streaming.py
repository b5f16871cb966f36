"""Streaming TTS latency: time-to-first-audio vs whole-utterance serving.

Measures make_streaming_text2wav (one jitted FastSpeech2 synthesis +
fixed-window chunked vocoder, audio_out/streaming.py) against the
one-shot make_text2wav pipeline on the chip: time until the FIRST audio
chunk is host-ready, and the steady-state streamed realtime factor.

Usage: python benchmarks/bench_streaming.py [iters] [chunk] [float32|bfloat16]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(iters: int = 10, chunk: int = 64, dtype: str = "bfloat16"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    from bench import pin_realistic_durations
    from fscl_tpu.audio_out.pipeline import make_text2wav
    from fscl_tpu.audio_out.streaming import make_streaming_text2wav
    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.models.hifigan import HiFiGANGenerator
    from fscl_tpu.systems.baseline import BaselineSystem

    B, L, T = 8, 128, 512
    hop, sr = 256, 22050
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
        dtype=jnp.bfloat16 if dtype == "bfloat16" else None)
    voc_vars = HiFiGANGenerator(n_mels=cfg.audio.n_mels).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, cfg.audio.n_mels)))

    args = (jnp.asarray(texts), jnp.asarray(np.full((B,), L, np.int32)),
            jnp.asarray(batch.speaker_args), jnp.asarray(batch.lang_ids))

    stream = make_streaming_text2wav(system, state, voc, voc_vars, T,
                                     chunk=chunk)
    one_shot = make_text2wav(system, state, voc, voc_vars, T)

    # warm both compiled paths
    chunks = list(stream(*args))
    jax.block_until_ready(one_shot(*args)[0])
    n_chunks = len(chunks)

    first, total = [], []
    for _ in range(iters):
        t0 = time.time()
        it = stream(*args)
        _, wav0, _ = next(it)          # np.asarray in the generator syncs
        first.append(time.time() - t0)
        for _ in it:
            pass
        total.append(time.time() - t0)

    # device-compute-only first-chunk latency: time until the first
    # window's wav is READY ON DEVICE (what a locally-attached server
    # sees), without the tunnel's per-readback host-transfer penalty
    from fscl_tpu.audio_out.streaming import _window_vocoder, generator_halo
    window = chunk + 2 * generator_halo(voc)
    vocode = _window_vocoder(voc, True)

    @jax.jit
    def synth_mel(texts, src_lens, speaker_args, lang_ids):
        return system.synthesize(state.params, state.batch_stats, texts,
                                 src_lens, T, speaker_args,
                                 lang_ids).postnet_mel

    jax.block_until_ready(vocode(voc_vars, synth_mel(*args)[:, :window]))
    dev_first = []
    for _ in range(iters):
        t0 = time.time()
        w0 = vocode(voc_vars, synth_mel(*args)[:, :window])
        jax.block_until_ready(w0)
        dev_first.append(time.time() - t0)
    oneshot_t = []
    for _ in range(iters):
        t0 = time.time()
        wav, _ = one_shot(*args)
        jax.block_until_ready(wav)
        oneshot_t.append(time.time() - t0)

    first_ms = float(np.median(first) * 1000)
    total_ms = float(np.median(total) * 1000)
    oneshot_ms = float(np.median(oneshot_t) * 1000)
    audio_s = B * T * hop / sr
    print(json.dumps({
        "metric": "streaming_tts_first_audio_ms",
        "value": round(first_ms, 2), "unit": "ms",
        "device_first_chunk_ms": round(float(np.median(dev_first)) * 1000, 2),
        "first_chunk_audio_s": round(B * chunk * hop / sr, 2),
        "one_shot_ms": round(oneshot_ms, 2),
        "stream_total_ms": round(total_ms, 2),
        "stream_realtime_factor": round(audio_s / (total_ms / 1000), 1),
        "n_chunks": n_chunks, "chunk_mel_frames": chunk,
        "batch": B, "mel_bucket": T, "vocoder_dtype": dtype,
        "vs_baseline": None}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10,
         int(sys.argv[2]) if len(sys.argv) > 2 else 64,
         sys.argv[3] if len(sys.argv) > 3 else "bfloat16")
