"""Synthesis phase ablation: where do the ~90 ms/iter go?

The headline synthesis bench (bench.py) measures the full no-target
forward at B=8, L=128, T=512 (enc4/dec6 256d). Roofline says that model
is single-digit ms of MXU work on a v5e; measured is ~90 ms/iter. This
probe times each phase in isolation (same shapes, same jit discipline)
to locate the bottleneck:

  encoder        (B, 128, 256) -> Encoder (4 FFT blocks)
  var_adaptor    encoder output -> predicted durations/pitch/energy +
                 length-regulated frames (T=512)
  decoder        (B, 512, 256) -> Decoder (6 FFT blocks)
  postnet        (B, 512, 80) -> PostNet (5 convs, 512 ch)
  full           the real synthesize() for cross-checking

Usage: python benchmarks/bench_synth_ablate.py [iters]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(iters: int = 50):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    from fscl_tpu.core.config import ModelConfig, OptimConfig, SpeakerConfig
    from fscl_tpu.data.batch import Batch
    from fscl_tpu.nn.fft_block import Decoder, Encoder, PostNet
    from fscl_tpu.nn.variance_adaptor import VarianceAdaptor
    from fscl_tpu.ops.masking import length_mask
    from fscl_tpu.systems.baseline import BaselineSystem

    B, L, T = 8, 128, 512
    cfg = ModelConfig(speaker=SpeakerConfig(n_speakers=64), max_seq_len=1000)
    n_sym = 361
    system = BaselineSystem(cfg, OptimConfig(), (("en", n_sym),))
    rng = np.random.default_rng(0)
    texts = rng.integers(1, n_sym, (B, L)).astype(np.int32)
    dur = rng.integers(1, 6, (B, L)).astype(np.int32)
    batch = Batch((np.arange(B) % 64).astype(np.int32), texts,
                  np.full((B,), L, np.int32),
                  rng.normal(size=(B, T, 80)).astype(np.float32),
                  np.minimum(dur.sum(1), T).astype(np.int32),
                  rng.normal(size=(B, L)).astype(np.float32),
                  rng.normal(size=(B, L)).astype(np.float32),
                  dur, np.zeros((B,), np.int32))
    state = system.init_state(jax.random.PRNGKey(0), batch)
    params, bs = state.params, state.batch_stats
    from bench import pin_realistic_durations
    params = pin_realistic_durations(params)
    mp = params["model"]

    t = cfg.transformer
    enc_mod = Encoder(t.encoder_layer, t.encoder_hidden, t.encoder_head,
                      t.conv_filter_size, t.conv_kernel_size,
                      t.encoder_dropout, cfg.max_seq_len, cfg.remat, None)
    dec_mod = Decoder(t.decoder_layer, t.decoder_hidden, t.decoder_head,
                      t.conv_filter_size, t.conv_kernel_size,
                      t.decoder_dropout, cfg.max_seq_len, cfg.remat, None)
    post_mod = PostNet(cfg.audio.n_mels, dtype=None)
    va_mod = VarianceAdaptor(cfg, system.stats)

    emb = jnp.asarray(rng.normal(size=(B, L, t.encoder_hidden)),
                      jnp.float32)
    src_valid = length_mask(jnp.full((B,), L, jnp.int32), L)
    dec_in = jnp.asarray(rng.normal(size=(B, T, t.decoder_hidden)),
                         jnp.float32)
    mel_valid = length_mask(jnp.full((B,), T, jnp.int32), T)
    mel_in = jnp.asarray(rng.normal(size=(B, T, cfg.audio.n_mels)),
                         jnp.float32)

    results = {}

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / iters * 1e3
        results[name] = round(ms, 3)
        print(json.dumps({"phase": name, "ms_per_iter": round(ms, 3)}))
        return out

    @jax.jit
    def full(tx, s, sp, lg):
        out = system.synthesize(params, bs, tx, s, T, sp, lg)
        return out.postnet_mel, out.mel_len

    args = (jnp.asarray(texts), jnp.asarray(np.full((B,), L, np.int32)),
            jnp.asarray(batch.speaker_args), jnp.asarray(batch.lang_ids))
    timeit("full_synthesize", full, *args)

    timeit("encoder", jax.jit(
        lambda e: enc_mod.apply({"params": mp["encoder"]}, e, src_valid)),
        emb)

    timeit("var_adaptor", jax.jit(
        lambda x: va_mod.apply({"params": mp["variance_adaptor"]},
                               x, src_valid, T, None).x), emb)

    timeit("decoder", jax.jit(
        lambda x: dec_mod.apply({"params": mp["decoder"]}, x, mel_valid)),
        dec_in)

    post_vars = {"params": mp["postnet"]}
    if bs is not None and "postnet" in bs["model"]:
        post_vars["batch_stats"] = bs["model"]["postnet"]
    timeit("postnet", jax.jit(
        lambda m: post_mod.apply(post_vars, m)), mel_in)

    accounted = sum(v for k, v in results.items() if k != "full_synthesize")
    print(json.dumps({"phase": "sum_of_parts", "ms_per_iter":
                      round(accounted, 3),
                      "full": results["full_synthesize"]}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
