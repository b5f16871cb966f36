"""Ablate the HiFiGAN generator stage-by-stage to locate vocoder time.

The e2e serving bench (bench_e2e_tts.py) shows the vocoder dominates the
fused text->wav program (FastSpeech2 is ~2.4 ms of ~41 ms bf16). This
probe times generator prefixes — conv_pre only, then cumulatively adding
each upsample+resblock stage, then conv_post/tanh — so the per-stage cost
(channels 256/128/64/32, lengths T*8/64/128/256) is explicit. It answers
whether a fused Pallas resblock-stage kernel should target the wide-short
head or the narrow-long tail.

Usage: python benchmarks/bench_vocoder_ablate.py [iters] [float32|bfloat16]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(iters: int = 20, dtype: str = "bfloat16", B: int = 8, T: int = 512):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    from fscl_tpu.models.hifigan import HiFiGANGenerator, ResBlock1, _leaky

    dt = jnp.bfloat16 if dtype == "bfloat16" else None
    full = HiFiGANGenerator(n_mels=80, dtype=dt)
    voc_vars = HiFiGANGenerator(n_mels=80).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 80)))

    mel = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 80)),
                      jnp.float32)

    class Prefix(nn.Module):
        """First `n_stages` of the generator, optional resblocks/post."""
        n_stages: int
        with_res: bool = True
        with_post: bool = False
        dtype: object = None

        @nn.compact
        def __call__(self, mel):
            g = full
            x = nn.Conv(g.upsample_initial_channel, (7,), padding="SAME",
                        dtype=self.dtype, name="conv_pre")(mel)
            for i in range(self.n_stages):
                r = g.upsample_rates[i]
                k = g.upsample_kernel_sizes[i]
                x = _leaky(x)
                ch = g.upsample_initial_channel // (2 ** (i + 1))
                x = nn.ConvTranspose(ch, (k,), strides=(r,), padding="SAME",
                                     transpose_kernel=True, dtype=self.dtype,
                                     name=f"ups_{i}")(x)
                if not (self.with_res or i < self.n_stages - 1):
                    continue
                acc = None
                for j, (rk, rd) in enumerate(zip(g.resblock_kernel_sizes,
                                                 g.resblock_dilations)):
                    h = ResBlock1(ch, rk, rd, dtype=self.dtype,
                                  name=f"resblock_{i}_{j}")(x)
                    acc = h if acc is None else acc + h
                x = acc / len(g.resblock_kernel_sizes)
            if self.with_post:
                x = _leaky(x)
                x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
                return jnp.tanh(x.astype(jnp.float32))[..., 0]
            return jnp.sum(x.astype(jnp.float32))  # tiny readback

        # (upsample-only variant handled by with_res on the last stage)

    def timeit(label, mod):
        fn = jax.jit(functools.partial(mod.apply, voc_vars))
        out = fn(mel)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(mel)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / iters * 1000
        print(json.dumps({"probe": label, "ms": round(ms, 2)}), flush=True)
        return ms

    prev = timeit("conv_pre", Prefix(0, dtype=dt))
    for n in range(1, 5):
        no_res = timeit(f"stages<= {n} (res up to {n-2}, none on {n-1})",
                        Prefix(n, with_res=False, dtype=dt))
        with_res = timeit(f"stages<= {n} (+res {n-1})",
                          Prefix(n, with_res=True, dtype=dt))
        print(json.dumps({"stage": n - 1,
                          "ups_ms": round(no_res - prev, 2),
                          "res_ms": round(with_res - no_res, 2)}), flush=True)
        prev = with_res
    total = timeit("full generator", Prefix(4, with_res=True, with_post=True,
                                            dtype=dt))
    print(json.dumps({"post_tanh_ms": round(total - prev, 2),
                      "total_ms": round(total, 2),
                      "dtype": dtype, "B": B, "T": T}), flush=True)


if __name__ == "__main__":
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    dt = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    main(it, dt)
