"""MXU-dense HiFiGAN serving ops (the vocoder tail of text->wav).

Why: XLA's conv lowering collapses at narrow channel counts — measured on
a v5e (B=8, T_mel=512, bf16, benchmarks/bench_vocoder_ablate.py): the
C=32 MRF stage runs 16.7 ms vs a ~1.4 ms full-MXU roofline, conv_pre
3.4 ms and conv_post+tanh 3.2 ms for sub-0.1-ms ops, because 32-wide
channels leave 3/4 (or 127/128) of the MXU lanes idle. Three re-
formulations fix the measured hot spots (all pure XLA — differentiable,
platform-independent):

- `packed_resblock_stage`: pack P=128/C consecutive samples into the
  channel dim ((B, T, C) -> (B, T/P, P*C)) and repack each conv kernel
  into a banded (kz, P*C, P*C) matrix (`_packed_conv_weight`). Full lanes
  at a ~2.9x band-waste beats a 4x lane deficit: C=32 stage 16.7 -> 9.0 ms
  on-chip. (C=64 at P=2 measured 15.4 vs 7.8 plain — only C=32 packs.)
- `conv_pre_matmul`: the k=7, 80->512 head as an unfolded matmul.
- `conv_post_packed`: the k=7, C->1 wav head + tanh as a k=34 stride-32
  packed conv emitting 128 samples/row (3.5 -> 2.5 ms).

`fused_generator_apply` is the drop-in serving forward wired into
audio_out (whole generator bf16: 39.5 -> 28.7 ms on-chip, 1.38x; f32
52.5 -> 36.9 ms). Semantics match `models/hifigan.py` (the reference
consumes the torch HiFiGAN through dlhlp_lib.vocoders,
lightning/utils/tool.py:20-42); zero row-padding in the packed layout
reproduces conv-SAME exactly.

`fused_mrf_stage` (Pallas, below) is a kept, semantics-pinned ABLATION:
one pallas_call per MRF stage with halo tiles and in-VMEM unfolded-matmul
convs. On-chip it LOST to both XLA and the packed form (C=32: 25.8 ms) —
Mosaic has no 16-bit sublane rotate or bf16 compare, so the k shifted
taps per conv become f32 roll+cast VPU traffic that dwarfs the saved HBM
round trips. Kept for the record and as a starting point if Mosaic gains
16-bit rotates.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

HALO = 64  # >= stage receptive field 60 (k=11, d=1/3/5) + wav-head reach 3


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


def _stage_kernel(*refs, meta, tile, t_orig, compute_dtype, has_post,
                  write_stage_out, interpret):
    """One (batch, tile) cell: full MRF stage over a haloed window.

    refs layout: x_prev, x_cur, x_next, then per conv (w, b) pairs in
    resblock order, then optional (post_w, post_b), then outputs
    ([stage_out], [wav_out]).
    """
    n_out = int(write_stage_out) + int(has_post)
    in_refs, out_refs = refs[:-n_out], refs[-n_out:]
    x_prev, x_cur, x_next = in_refs[0], in_refs[1], in_refs[2]
    wb = in_refs[3:]

    t = pl.program_id(1)
    C = x_cur.shape[-1]
    W = tile + 2 * HALO
    cdt = compute_dtype
    acc_dt = jnp.promote_types(jnp.float32, cdt)

    # Element-wise math (leaky, residuals, masks, rolls) stays in f32: the
    # VPU has no bf16 compare ("Target does not support this comparison")
    # or 16-bit rotate, and f32 residuals only help accuracy. The compute
    # dtype applies to the MXU dot inputs (weights arrive pre-cast).
    win = jnp.concatenate(
        [x_prev[0, tile - HALO:, :], x_cur[0], x_next[0, :HALO, :]], axis=0
    ).astype(acc_dt)                                          # (W, C)
    g0 = t * tile - HALO
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0) + g0
    valid = (rows >= 0) & (rows < t_orig)                     # (W, 1)
    win = jnp.where(valid, win, 0)

    def taps_of(h, k, d):
        # k shifted views h[i*d : i*d + W], each realigned to sublane
        # offset 0 via a static roll — Mosaic cannot concat (or cheaply
        # consume) vectors whose sublane offsets disagree, which plain
        # slices at offsets i*d produce ("result/input offset mismatch
        # on non-concat dimension"). Cast to the MXU dtype per tap.
        r = (k - 1) // 2 * d
        n = W + 2 * r
        n_tot = n + (-n) % 8
        hp = jnp.pad(h, ((r, n_tot - W - r), (0, 0)))
        if interpret:
            return [jnp.roll(hp, n_tot - i * d, axis=0)[:W].astype(cdt)
                    for i in range(k)]
        from jax.experimental.pallas import tpu as pltpu
        return [(hp[:W] if i == 0 else
                 pltpu.roll(hp, n_tot - i * d, 0)[:W]).astype(cdt)
                for i in range(k)]

    def conv(h, w_ref, b_ref, k, d, unfold):
        # SAME conv over the window; taps ride the halo. w_ref is
        # (k*C_in, C_out) tap-major — matches flax nn.Conv kernel
        # (k, in, out).reshape(k*in, out).
        taps = taps_of(h, k, d)
        if unfold:
            u = jnp.concatenate(taps, axis=1)                 # (W, k*C)
            y = jax.lax.dot_general(
                u, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt)
        else:
            cin = h.shape[-1]
            y = None
            for i in range(k):
                yi = jax.lax.dot_general(
                    taps[i], w_ref[i * cin:(i + 1) * cin],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)
                y = yi if y is None else y + yi
        y = y + b_ref[0].astype(acc_dt)
        return jnp.where(valid, y, 0.0)

    unfold = C < 128
    wi = 0
    acc = None
    for k, dilations in meta:
        xj = win
        for d in dilations:
            h = _leaky(xj)
            h = conv(h, wb[wi], wb[wi + 1], k, d, unfold)
            h = _leaky(h)
            h = conv(h, wb[wi + 2], wb[wi + 3], k, 1, unfold)
            wi += 4
            xj = xj + h
        acc = xj if acc is None else acc + xj
    y = acc * (1.0 / len(meta))

    oi = 0
    if write_stage_out:
        out_refs[oi][0] = y[HALO:HALO + tile].astype(out_refs[oi].dtype)
        oi += 1
    if has_post:
        post_w, post_b = wb[wi], wb[wi + 1]
        kp = post_w.shape[0] // C
        u = jnp.concatenate(taps_of(_leaky(y), kp, 1), axis=1)
        wav = jax.lax.dot_general(
            u, post_w[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt) + post_b[0]
        wav = jnp.tanh(wav)                                   # (W, 1)
        out_refs[oi][0] = wav[HALO:HALO + tile].astype(jnp.float32)


def _default_tile(C: int) -> int:
    # sized so the whole working set (f32 window/residual buffers + k
    # rolled taps + the (W, k*C) unfold + weights) stays inside the 16 MB
    # scoped-VMEM limit — C=64 at tile 4096 measured 33.9 MB and C=32 at
    # tile 2048 measured 20.0 MB; both rejected by Mosaic
    return {128: 1024, 64: 1024}.get(C, 1024 if C <= 32 else 512)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "t_orig", "tile", "compute_dtype", "has_post",
                     "write_stage_out", "interpret"))
def _stage_call(x, flat_wb, *, meta, t_orig, tile, compute_dtype, has_post,
                write_stage_out, interpret):
    from jax.experimental.pallas import tpu as pltpu  # deferred: TPU only

    B, T, C = x.shape
    nT = T // tile
    kernel = functools.partial(
        _stage_kernel, meta=meta, tile=tile, t_orig=t_orig,
        compute_dtype=jnp.dtype(compute_dtype), has_post=has_post,
        write_stage_out=write_stage_out, interpret=interpret)

    def xspec(off):
        return pl.BlockSpec(
            (1, tile, C),
            lambda b, t, off=off: (b, jnp.clip(t + off, 0, nT - 1), 0),
            memory_space=pltpu.VMEM)

    wb_specs = [
        pl.BlockSpec(w.shape, lambda b, t, n=w.ndim: (0,) * n,
                     memory_space=pltpu.VMEM)
        for w in flat_wb
    ]
    out_shapes, out_specs = [], []
    if write_stage_out:
        out_shapes.append(jax.ShapeDtypeStruct((B, T, C), x.dtype))
        out_specs.append(pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                                      memory_space=pltpu.VMEM))
    if has_post:
        # (B, T, 1): a (1, tile) block over (B, T) violates the TPU
        # (8, 128) tiling rule; a trailing singleton equal to the full
        # dim is allowed. Squeezed in fused_mrf_stage.
        out_shapes.append(jax.ShapeDtypeStruct((B, T, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0),
                                      memory_space=pltpu.VMEM))

    taps = sum(2 * k * len(d) for k, d in meta)   # convs1+convs2 taps
    flops = 2 * B * T * taps * C * C + (2 * B * T * 7 * C if has_post else 0)
    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[xspec(-1), xspec(0), xspec(1)] + wb_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * T * C * x.dtype.itemsize,
            transcendentals=B * T if has_post else 0),
        interpret=interpret,
    )(x, x, x, *flat_wb)
    return out


def fused_mrf_stage(
    x: jnp.ndarray,                       # (B, T, C) stage input (post-ups)
    resblock_params: Sequence[dict],      # params of resblock_{i}_{j}, j=0..
    kernel_sizes: Sequence[int],
    dilations: Sequence[Tuple[int, ...]],
    *,
    compute_dtype=jnp.bfloat16,
    post_params: Optional[dict] = None,   # conv_post {kernel (7, C, 1), bias}
    tile: Optional[int] = None,
    interpret: bool = False,
):
    """Whole MRF stage (mean of resblocks) in one Pallas call.

    Returns the stage output (B, T, C) in x.dtype; with `post_params`
    returns (or only returns, matching the generator which discards the
    stage tensor) the wav head (B, T) float32 instead.
    """
    B, T, C = x.shape
    cdt = jnp.dtype(compute_dtype)
    tile = tile or _default_tile(C)
    if T < tile:  # tiny inputs: one tile, >= HALO and lane-aligned
        tile = max(128, -(-T // 128) * 128)
    t_orig = T
    if T % tile:
        x = jnp.pad(x, ((0, 0), (0, tile - T % tile), (0, 0)))

    meta = tuple((int(k), tuple(int(d) for d in ds))
                 for k, ds in zip(kernel_sizes, dilations))
    flat_wb = []
    for j, (k, ds) in enumerate(meta):
        p = resblock_params[j]
        for i in range(len(ds)):
            for name in (f"convs1_{i}", f"convs2_{i}"):
                kern = p[name]["kernel"]            # (k, C, C)
                flat_wb.append(jnp.asarray(kern).astype(cdt)
                               .reshape(k * C, C))
                flat_wb.append(jnp.asarray(p[name]["bias"])
                               .astype(jnp.float32).reshape(1, C))
    has_post = post_params is not None
    if has_post:
        kp = post_params["kernel"].shape[0]
        flat_wb.append(jnp.asarray(post_params["kernel"]).astype(cdt)
                       .reshape(kp * C, 1))
        flat_wb.append(jnp.asarray(post_params["bias"])
                       .astype(jnp.float32).reshape(1, 1))

    out = _stage_call(
        x, tuple(flat_wb), meta=meta, t_orig=t_orig,
        tile=tile, compute_dtype=str(cdt), has_post=has_post,
        write_stage_out=not has_post, interpret=interpret)
    if has_post:
        out = out[..., 0]
    if T % tile:
        out = out[:, :T]
    return out


def _packed_conv_weight(kernel: jnp.ndarray, d: int, P: int) -> jnp.ndarray:
    """Repack a dilated conv kernel (k, C, C) for the (B, T/P, P*C) layout.

    Output wz (kz, P*C, P*C): wz[sz, p_in*C+cin, p_out*C+cout] = w[i,cin,cout]
    where the packed row offset sz-hz and phases satisfy
    (sz-hz)*P + p_in - p_out = (i - (k-1)//2) * d. Zero row-padding of the
    packed conv reproduces conv-SAME exactly (T % P == 0). Placement
    indices are static; the kernel may be a jit tracer — assembly is one
    scatter of (N, C, Cout) blocks.
    """
    k, C, Cout = kernel.shape
    r = (k - 1) // 2 * d
    hz = -(-r // P)
    kz = 2 * hz + 1
    # constant 0/1 placement tensor; assembly is ONE einsum (a scatter
    # here lowers to hundreds of serialized dynamic-update-slices on TPU
    # and cost ~5 ms/stage per call)
    M = np.zeros((k, kz, P, P), np.float32)
    for sz in range(kz):
        for p_in in range(P):
            for p_out in range(P):
                num = (sz - hz) * P + p_in - p_out
                if num % d:
                    continue
                i = num // d + (k - 1) // 2
                if 0 <= i < k:
                    M[i, sz, p_in, p_out] = 1.0
    wz = jnp.einsum("kzpq,kio->zpiqo", jnp.asarray(M, kernel.dtype), kernel)
    return wz.reshape(kz, P * C, P * Cout)


def packed_resblock_stage(x, resblock_params, kernel_sizes, dilations,
                          *, P: int, compute_dtype=jnp.bfloat16):
    """MRF stage with every conv packed P-samples-per-channel-block.

    XLA's conv lowering collapses at narrow channel counts (C=32 resblocks
    measure 16.7 ms vs a 1.4 ms full-MXU roofline on a v5e): with C lanes
    of 128 filled, most of the MXU idles. Packing P consecutive samples
    into the channel dim makes every conv (B, T/P, P*C) -> (B, T/P, P*C)
    with a banded (kz, P*C, P*C) weight — P*C = 128 fills the lanes, and
    the band waste (sum kz*P / sum k = ~2.9x at C=32, P=4) is far smaller
    than the 4x lane deficit it removes. Pure XLA — differentiable and
    platform-independent; zero row-padding keeps conv-SAME semantics
    exactly.
    """
    B, T, C = x.shape
    if T % P:
        raise ValueError(f"T={T} not a multiple of P={P}")
    dt = jnp.dtype(compute_dtype)
    z = x.reshape(B, T // P, P * C)

    def pconv(h, kern, bias, d):
        wz = _packed_conv_weight(jnp.asarray(kern), d, P)
        out = jax.lax.conv_general_dilated(
            h.astype(dt), wz.astype(dt), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))
        return out + jnp.tile(jnp.asarray(bias), P).astype(dt)

    acc = None
    for j, (k, ds) in enumerate(zip(kernel_sizes, dilations)):
        p = resblock_params[j]
        xj = z
        for i, d in enumerate(ds):
            h = _leaky(xj)
            h = pconv(h, p[f"convs1_{i}"]["kernel"],
                      p[f"convs1_{i}"]["bias"], d)
            h = _leaky(h)
            h = pconv(h, p[f"convs2_{i}"]["kernel"],
                      p[f"convs2_{i}"]["bias"], 1)
            xj = xj + h
        acc = xj if acc is None else acc + xj
    out = acc / len(kernel_sizes)
    return out.reshape(B, T, C)


def conv_post_packed(y: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """conv_post (k=7, C->1) + tanh as a packed strided conv at full lanes.

    A width-1-output conv leaves 127/128 MXU lanes idle (XLA measures
    ~3.2 ms for a 0.1-ms op). Packing 4 samples into the channel dim
    (z = (B, T/4, 4C)) and emitting 128 consecutive samples per output row
    via a k=34 stride-32 conv makes both operand dims MXU-dense; the
    repacked weight spends ~20x the useful FLOPs but the op is ~9 GFLOP
    total — noise. Falls back to the plain conv when T % 128 != 0.
    """
    k, C, _ = kernel.shape
    B, T, _ = y.shape
    P, Q = 4, 128
    r = (k - 1) // 2
    dt = jnp.dtype(compute_dtype)
    h = _leaky(y)
    if T % Q or k > P * 2 + 1:
        out = jax.lax.conv_general_dilated(
            h.astype(dt), jnp.asarray(kernel, dt), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))
        return jnp.tanh((out + jnp.asarray(bias)).astype(jnp.float32))[..., 0]
    z = h.reshape(B, T // P, P * C).astype(dt)
    kz = Q // P + 2                       # 34 input rows per output row
    M = np.zeros((k, kz, P, Q), np.float32)
    for sz in range(kz):
        for p_in in range(P):
            for p_out in range(Q):
                i = P * (sz - 1) + p_in - p_out + r
                if 0 <= i < k:
                    M[i, sz, p_in, p_out] = 1.0
    w = jnp.einsum("kzpq,kc->zpcq", jnp.asarray(M, kernel.dtype),
                   jnp.asarray(kernel)[..., 0]).reshape(kz, P * C, Q)
    out = jax.lax.conv_general_dilated(
        z, w.astype(dt), window_strides=(Q // P,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"))     # (B, T/Q, Q)
    wav = jnp.tanh((out + jnp.asarray(bias)).astype(jnp.float32))
    return wav.reshape(B, T)


def conv_pre_matmul(mel: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """conv_pre (k=7, 80->512) as an unfolded matmul.

    XLA's conv lowering measures ~3.4 ms for this 2.3-GFLOP op on a v5e
    (unaligned C_in=80); the unfold + (B*T, 560) @ (560, 512) form is at
    the MXU roofline.
    """
    k, cin, cout = kernel.shape
    B, T, _ = mel.shape
    r = (k - 1) // 2
    dt = jnp.dtype(compute_dtype)
    mp = jnp.pad(mel, ((0, 0), (r, r), (0, 0))).astype(dt)
    u = jnp.concatenate([mp[:, i:i + T] for i in range(k)], axis=-1)
    w = jnp.asarray(kernel).astype(dt).reshape(k * cin, cout)
    y = jax.lax.dot_general(u, w, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + jnp.asarray(bias, jnp.float32)).astype(dt)


def fused_generator_apply(gen, variables, mel):
    """HiFiGAN generator forward with MXU-dense serving ops.

    Drop-in for `gen.apply(variables, mel)` at serving time: same param
    pytree, same output (B, T_mel * 256) float32. conv_pre runs as an
    unfolded matmul, the narrow-channel MRF stages (C <= 64) run
    sample-packed (packed_resblock_stage), and the wav head runs as a
    packed strided conv — the three spots where XLA's conv lowering is
    measured far off roofline (benchmarks/bench_vocoder_ablate.py).
    Pure XLA, so it is differentiable and platform-independent.
    """
    import flax.linen as nn

    from fscl_tpu.models.hifigan import ResBlock1, SubpixelUpsample

    p = variables["params"]
    cdt = jnp.dtype(gen.dtype) if gen.dtype is not None else jnp.float32

    x = conv_pre_matmul(mel, p["conv_pre"]["kernel"], p["conv_pre"]["bias"],
                        compute_dtype=cdt)
    n_stages = len(gen.upsample_rates)
    for i, (r, k) in enumerate(zip(gen.upsample_rates,
                                   gen.upsample_kernel_sizes)):
        x = _leaky(x)
        ch = gen.upsample_initial_channel // (2 ** (i + 1))
        if gen.upsample_impl == "subpixel":
            ups = SubpixelUpsample(ch, k, r, dtype=gen.dtype)
        else:
            ups = nn.ConvTranspose(ch, (k,), strides=(r,), padding="SAME",
                                   transpose_kernel=True, dtype=gen.dtype)
        x = ups.apply({"params": p[f"ups_{i}"]}, x)
        res_p = [p[f"resblock_{i}_{j}"]
                 for j in range(len(gen.resblock_kernel_sizes))]
        # Wide stages stay on plain convs: C=256 is at its MXU roofline
        # already (2.79 ms measured = 2.7 ms roofline) and C=128 is near
        # it (6.77 ms). The narrow tail (C<=64) is where XLA's conv
        # lowering collapses (7.8/16.7 ms vs lane-limited ~5.5 ms):
        # those stages run sample-packed so P*C fills the 128 lanes.
        P = 128 // ch
        if P <= 1 or x.shape[1] % P:
            acc = None
            for j, (rk, rd) in enumerate(zip(gen.resblock_kernel_sizes,
                                             gen.resblock_dilations)):
                h = ResBlock1(ch, rk, rd, dtype=gen.dtype).apply(
                    {"params": res_p[j]}, x)
                acc = h if acc is None else acc + h
            x = acc / len(gen.resblock_kernel_sizes)
        else:
            x = packed_resblock_stage(
                x, res_p, gen.resblock_kernel_sizes,
                gen.resblock_dilations, P=P, compute_dtype=cdt)
    return conv_post_packed(x, p["conv_post"]["kernel"],
                            p["conv_post"]["bias"], compute_dtype=cdt)


def vocoder_apply(gen, fused: bool = True):
    """Return the serving forward for a generator: callable(variables, mel).

    The single dispatch point for the fused-vs-module policy shared by
    audio_out/pipeline.py, audio_out/streaming.py and audio_out/vocoder.py:
    a HiFiGANGenerator with fused=True routes through
    `fused_generator_apply`; everything else (MelGAN, fused=False opt-out
    for exact reproduction of module-apply waveforms) uses `gen.apply`.
    """
    from fscl_tpu.models.hifigan import HiFiGANGenerator
    if fused and isinstance(gen, HiFiGANGenerator):
        return functools.partial(fused_generator_apply, gen)
    return gen.apply
