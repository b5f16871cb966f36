"""On-chip throughput for the T2U and PR experiment families (VERDICT r3 #1).

Three bench-grade metrics, each in a fresh process via main(mode):

1. t2u_unit_decode_units_per_sec — the autoregressive Tacotron2-style
   unit decoder (SURVEY §7.3 hard part #1; reference
   lightning/systems/t2u/tacotron2/tacot2u_model.py:293-362) at FULL size
   (1024-dim attention/decoder LSTMs), batched lax.scan inference. The
   scan always executes max_steps decoder steps (static shapes), so the
   honest unit-throughput credit is B * max_steps / wall — every step
   computes one unit's logits per batch row.

2. t2u_chained_tts_realtime_factor — text -> units (autoregressive) ->
   u2s FastSpeech2 -> HiFiGAN V1 wav, the e2e T2U serving chain
   (TransEmbE2ETune chaining, reference TransEmbE2ETune.py:169-193), with
   the u2s duration head pinned to realistic lengths like the headline
   synthesis bench.

3. pr_transcription_frames_per_sec — protonet query transcription
   (reference evaluation/protonet.py:28-217): frozen hubert-large
   (scanned, bf16) -> Downstream1 -> -L2 to prototypes -> frame argmax,
   at 50 frames/s of audio; also reports x-realtime on the audio axis.

Usage: python benchmarks/bench_t2u_pr.py [unit_decode|chained|pr|all]
"""
from __future__ import annotations

import json
import sys
import time

import os
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR_MEL = 22050
HOP = 256


def _t2u_model_and_params(rng, B=8, L=64, n_units=512):
    import jax
    import jax.numpy as jnp

    from fscl_tpu.models.tacotron2_t2u import T2UConfig, TacoT2U

    cfg = T2UConfig(n_units=n_units)        # full size (1024-d LSTMs)
    model = TacoT2U(cfg)
    emb = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, L, cfg.symbols_embedding_dim)).astype(np.float32))
    src_lens = jnp.full((B,), L, jnp.int32)
    variables = model.init(rng, emb, src_lens,
                           jax.random.PRNGKey(1), method="infer")
    return model, variables, emb, src_lens


def run_unit_decode(B=8, L=64, iters=10):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    import jax.numpy as jnp

    model, variables, emb, src_lens = _t2u_model_and_params(
        jax.random.PRNGKey(0), B=B, L=L)
    max_steps = model.cfg.max_decoder_ratio * L

    @jax.jit
    def infer(v, e, sl, r, feedback):
        # the previous call's output perturbs this call's input: on the
        # tunneled backend only threaded-state loops measure honestly
        # (BASELINE.md round-2 pitfalls); the threaded and distinct-key
        # protocols agree at 1.6 ms here (round-4 session)
        logits, preds, n_steps, al = model.apply(
            v, e + 1e-6 * feedback, sl, r, method="infer")
        return preds, n_steps, jnp.mean(logits) * jnp.ones_like(e)

    fb = jnp.zeros_like(emb)
    t0 = time.time()
    out = infer(variables, emb, src_lens, jax.random.PRNGKey(2), fb)
    # end the warmup with a REAL host readback: on the tunneled backend
    # block_until_ready returns before execution finishes, so without
    # this the compile+first-run drains into the timed loop
    _ = float(jnp.sum(out[2][:1, :1, :1]))
    compile_s = time.time() - t0

    fb = out[2]
    t0 = time.time()
    for i in range(iters):
        _, _, fb = infer(variables, emb, src_lens,
                         jax.random.PRNGKey(3 + i), fb)
    _ = float(jnp.sum(fb[:1, :1, :1]))       # real readback ends the timing
    dt = time.time() - t0
    units = B * max_steps * iters
    return {
        "metric": "t2u_unit_decode_units_per_sec",
        "value": round(units / dt, 1), "unit": "units/s",
        "batch": B, "text_len": L, "decoder_steps": max_steps,
        "decoder_steps_per_sec": round(max_steps * iters / dt, 1),
        "ms_per_utterance_batch": round(dt / iters * 1000, 2),
        "compile_s": round(compile_s, 1), "vs_baseline": None,
    }


def run_chained(B=8, L=64, n_units_seq=192, iters=10):
    """text -> autoregressive units -> u2s FastSpeech2 -> HiFiGAN wav."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    import jax.numpy as jnp

    from bench import pin_realistic_durations
    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.models.hifigan import HiFiGANGenerator
    from fscl_tpu.ops.hifigan_fused import fused_generator_apply
    from fscl_tpu.systems.baseline import BaselineSystem

    model, variables, emb, src_lens = _t2u_model_and_params(
        jax.random.PRNGKey(0), B=B, L=L)

    # u2s: FastSpeech2 over a unit symbol table (the reference's frozen
    # pre-trained u2s BaselineSystem, TransEmbE2ETune.py:56-68)
    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=8), max_seq_len=1000)
    u2s = BaselineSystem(cfg, OptimConfig(), (("units", 520),))
    rng = np.random.default_rng(1)
    dur = rng.integers(1, 5, (B, n_units_seq)).astype(np.int32)
    dummy = Batch(
        np.zeros(B, np.int32),
        rng.integers(1, 520, (B, n_units_seq)).astype(np.int32),
        np.full((B,), n_units_seq, np.int32),
        np.zeros((B, 256, 80), np.float32),
        np.minimum(dur.sum(1), 256).astype(np.int32),
        rng.normal(size=(B, n_units_seq)).astype(np.float32),
        rng.normal(size=(B, n_units_seq)).astype(np.float32),
        dur, np.zeros(B, np.int32))
    u2s_state = u2s.init_state(jax.random.PRNGKey(4), dummy)
    u2s_params = pin_realistic_durations(u2s_state.params)

    voc = HiFiGANGenerator(n_mels=80, dtype=jnp.bfloat16)
    voc_vars = HiFiGANGenerator(n_mels=80).init(
        jax.random.PRNGKey(5), jnp.zeros((1, 16, 80)))

    T_mel = 1000                               # 192 units x ~5 frames

    # Staged 3-jit chain with device-resident intermediates. A single
    # fused jit of all three stages compiles but executes pathologically
    # on device (~36 s/call vs <5 ms for the stages run back-to-back —
    # XLA scheduling of the 384-step decoder scan composed with the
    # upsampling vocoder; pinned in BASELINE.md round-4). Serving chains
    # the stages exactly like this anyway (the reference chains separate
    # model calls, TransEmbE2ETune.py:169-193), so the staged timing IS
    # the serving number, not a concession.
    @jax.jit
    def s_t2u(t2u_vars, e, sl, r, prev_wav):
        # the previous iteration's wav perturbs this one's input so the
        # loop serializes honestly on the tunneled backend — computed
        # IN-JIT: every eager op between iterations is its own tunnel
        # dispatch (~30 ms each measured under load, round-4 session)
        fb = jnp.mean(prev_wav.astype(jnp.float32))
        _, preds, _, _ = model.apply(t2u_vars, e + 1e-6 * fb, sl, r,
                                     method="infer")
        return jnp.clip(preds[:, :n_units_seq], 0, 519).astype(jnp.int32)

    @jax.jit
    def s_u2s(up, ubs, units):
        unit_lens = jnp.full((B,), n_units_seq, jnp.int32)
        out = u2s.synthesize(up, ubs, units, unit_lens, T_mel,
                             jnp.zeros((B,), jnp.int32),
                             jnp.zeros((B,), jnp.int32))
        return out.postnet_mel, out.mel_len

    @jax.jit
    def s_voc(vv, mel):
        return fused_generator_apply(voc, vv, mel)

    @jax.jit
    def s_acc(frames, mel_len):
        # audio accounting stays ON DEVICE: a per-iteration host readback
        # of mel_len costs a full tunnel round-trip (~1.1 s measured,
        # 2026-08-19) and would dominate the ~100 ms of real compute
        return frames + jnp.sum(mel_len)

    def chain(prev_wav, r, frames):
        units = s_t2u(variables, emb, src_lens, r, prev_wav)
        mel, mel_len = s_u2s(u2s_params, u2s_state.batch_stats, units)
        wav = s_voc(voc_vars, mel)
        return wav, s_acc(frames, mel_len)

    print("[chained] models initialized; compiling stages...",
          file=sys.stderr, flush=True)
    t0 = time.time()
    wav0 = jnp.zeros((B, T_mel * 256), jnp.float32)
    wav, frames = chain(wav0, jax.random.PRNGKey(6),
                        jnp.zeros((), jnp.int32))
    # real host readback: block_until_ready is not honest on the tunnel,
    # so without this the warmup's execution drains into the timed loop
    _ = float(jnp.sum(wav[:1, :8].astype(jnp.float32))) + int(frames)
    # second warmup with the REAL wav shape: if s_voc's output shape
    # differs from wav0's guess, s_t2u would otherwise recompile inside
    # the timed loop
    wav, frames = chain(wav, jax.random.PRNGKey(6), jnp.zeros((), jnp.int32))
    _ = float(jnp.sum(wav[:1, :8].astype(jnp.float32))) + int(frames)
    compile_s = time.time() - t0
    print(f"[chained] compiled in {compile_s:.1f}s; timing...",
          file=sys.stderr, flush=True)

    t0 = time.time()
    frames = jnp.zeros((), jnp.int32)
    for i in range(iters):
        # the previous wav threads into the next input INSIDE s_t2u —
        # iterations serialize honestly with zero eager ops in the loop
        wav, frames = chain(wav, jax.random.PRNGKey(7 + i), frames)
    audio_s = int(frames) * HOP / SR_MEL      # ONE readback ends the timing
    _ = float(jnp.sum(wav[:1, :8].astype(jnp.float32)))
    dt = time.time() - t0
    return {
        "metric": "t2u_chained_tts_realtime_factor",
        "value": round(audio_s / dt, 1), "unit": "x realtime",
        "batch": B, "text_len": L, "units_per_utt": n_units_seq,
        "mel_bucket": T_mel, "ms_per_batch": round(dt / iters * 1000, 1),
        "staging": "staged jits (t2u | u2s | vocoder | acc), device-resident",
        "compile_s": round(compile_s, 1), "vs_baseline": None,
    }


def run_pr(B=8, wav_s=4.0, iters=20, n_symbols=64):
    """Protonet query transcription at full size (hubert-large scanned
    bf16 upstream + Downstream1 + -L2 prototypes + frame argmax)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")
    import jax.numpy as jnp

    from fscl_tpu.core.config import ModelConfig, OptimConfig, UpstreamConfig
    from fscl_tpu.systems.pr import PRBatch, SSLProtoNetSystem

    cfg = ModelConfig(upstream=UpstreamConfig(
        scan_layers=True, compute_dtype="bfloat16"))
    system = SSLProtoNetSystem(cfg, OptimConfig(),
                               (("ko", n_symbols),))
    rng = np.random.default_rng(0)
    T = int(wav_s * 16000)
    wavs = rng.normal(size=(B, T)).astype(np.float32) * 0.1
    L = 40
    avg = np.full((B, L), 4, np.int32)
    batch = PRBatch(wavs, np.full((B,), T, np.int32), avg,
                    rng.integers(1, n_symbols, (B, L)).astype(np.int32),
                    np.zeros(B, np.int32), n_symbols=n_symbols,
                    symbol_id="ko")
    from fscl_tpu.systems.pr import PREpisode
    state = system.init_state(jax.random.PRNGKey(0),
                              PREpisode(batch, batch))
    protos = jnp.asarray(
        rng.normal(size=(n_symbols,
                         cfg.transformer.encoder_hidden)).astype(np.float32))

    @jax.jit
    def transcribe(params, frozen, protos, wavs, wav_lens, prev):
        # the previous call's prediction perturbs this call's input so
        # iterations serialize honestly on the tunneled backend — IN-JIT:
        # the round-4 eager-threading protocol (dw = dw + 1e-9 * pred[...]
        # between calls) paid ~3 eager tunnel dispatches per iteration,
        # most of the 110 ms/batch it reported (BASELINE.md round-4
        # follow-up); the compute itself is ~20 ms
        wavs = wavs + 1e-9 * prev[:, :1].astype(jnp.float32)
        logits = system.classify(
            params, protos,
            PRBatch(wavs, wav_lens, avg, batch.phonemes, batch.lang_ids,
                    n_symbols=n_symbols, symbol_id="ko"),
            upstream_params=frozen["upstream"])
        return jnp.argmax(logits, axis=-1)

    from fscl_tpu.models.hubert import ssl_num_frames
    dw = jnp.asarray(wavs)
    dl = jnp.full((B,), T, jnp.int32)
    pred = jnp.zeros((B, ssl_num_frames(T)), jnp.int32)
    t0 = time.time()
    pred = transcribe(state.params, state.frozen, protos, dw, dl, pred)
    _ = int(pred[0, 0])                       # real readback ends the warmup
    compile_s = time.time() - t0

    n_frames = pred.shape[1]
    t0 = time.time()
    for _ in range(iters):
        pred = transcribe(state.params, state.frozen, protos, dw, dl, pred)
    _ = int(pred[0, 0])                       # real readback ends the timing
    dt = time.time() - t0
    frames = B * n_frames * iters
    return {
        "metric": "pr_transcription_frames_per_sec",
        "value": round(frames / dt, 1), "unit": "frames/s",
        "x_realtime": round(B * wav_s * iters / dt, 1),
        "batch": B, "wav_seconds": wav_s, "frames_per_utt": int(n_frames),
        "upstream": "hubert-large (scan, bf16)",
        "ms_per_batch": round(dt / iters * 1000, 1),
        "compile_s": round(compile_s, 1), "vs_baseline": None,
    }


def main(mode="all"):
    out = []
    if mode in ("unit_decode", "all"):
        out.append(run_unit_decode())
        print(json.dumps(out[-1]), flush=True)
    if mode in ("chained", "all"):
        out.append(run_chained())
        print(json.dumps(out[-1]), flush=True)
    if mode in ("pr", "all"):
        out.append(run_pr())
        print(json.dumps(out[-1]), flush=True)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
