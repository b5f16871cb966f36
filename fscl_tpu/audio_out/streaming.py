"""Streaming TTS serving: chunked vocoding with receptive-field halos.

The reference synthesizes whole utterances then vocodes them in one shot
(lightning/utils/log.py synth_samples -> vocoder infer), so first audio
arrives only after the full wav is computed. HiFiGAN is a finite-
receptive-field convnet: a wav sample depends on <= ~15 mel frames either
side (conv_pre +-3 frames, then per stage ceil(k_up/r) transposed-conv
reach + 60-sample MRF reach at that stage's rate, conv_post +-3 samples).
So the vocoder can run on fixed-size mel windows clamped inside the
utterance and emit exact chunk*hop samples: every tap a chunk sample
needs is inside the window, and edge windows share the true array edge so
per-layer conv-SAME padding matches the full computation (see
chunked_vocode for why a zero-padded halo would NOT be exact). Chunked
output equals the full-utterance vocode (tests/test_streaming.py pins
allclose at f32).

TPU-shaped: one jitted FastSpeech2 synthesis (static mel bucket) + one
jitted fixed-window vocoder reused for every chunk — two compiles total,
any utterance length. Time-to-first-audio becomes synthesis + ONE window
instead of synthesis + the whole utterance (benchmarks/bench_streaming.py
measures both).
"""
from __future__ import annotations

import functools
import math
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# fallback mel-frame halo for generators whose receptive field cannot be
# derived from the module config (see generator_halo). For the HiFiGAN V1
# config the analytic bound is 15 frames (measured by single-frame
# perturbation: +-12.5).
DEFAULT_HALO = 16


def _has_halo_fields(gen) -> bool:
    """True when the module declares the HiFiGAN config fields
    generator_halo derives the receptive field from."""
    return bool(getattr(gen, "upsample_rates", None)
                and getattr(gen, "upsample_kernel_sizes", None)
                and getattr(gen, "resblock_kernel_sizes", None)
                and getattr(gen, "resblock_dilations", None))


def generator_hop(gen) -> Optional[int]:
    """Samples emitted per mel frame, derived from the module config
    (prod(upsample_rates)); None when the module doesn't declare rates."""
    rates = getattr(gen, "upsample_rates", None)
    if rates:
        return int(np.prod(rates))
    return None


def generator_halo(gen) -> int:
    """Mel-frame halo covering the generator's receptive field, derived
    from the HiFiGAN config fields (+1 frame margin over the analytic
    bound). A sample's reach back through the net, in mel frames:
    conv_pre (k-1)/2, per stage the exact asymmetric transposed-conv
    reach (k+r-2)/(2r) at the incoming rate (NOT ceil(k/(2r)), which
    underestimates the forward reach for rate-1 or thin-kernel stages)
    plus the MRF dilated-conv reach at the outgoing rate, conv_post
    (k-1)/2 at the sample rate. Falls back to DEFAULT_HALO for modules
    without these fields (e.g. MelGAN); exactness for any new config is
    pinned by the chunked==full test (tests/test_streaming.py)."""
    rates = getattr(gen, "upsample_rates", None)
    kups = getattr(gen, "upsample_kernel_sizes", None)
    rks = getattr(gen, "resblock_kernel_sizes", None)
    rds = getattr(gen, "resblock_dilations", None)
    if not (rates and kups and rks and rds):
        return DEFAULT_HALO
    rf = 3.0                                      # conv_pre, k=7
    cum = 1.0
    for r, k in zip(rates, kups):
        rf += ((k + r - 2) / (2 * r)) / cum
        cum *= r
        # per resblock: dilated conv (rk-1)/2*d + following k-dilation-1
        # conv (rk-1)/2, summed over the dilation stack; worst kernel wins
        mrf = max(sum((rk - 1) // 2 * (d + 1) for d in rd)
                  for rk, rd in zip(rks, rds))
        rf += mrf / cum
    rf += 3.0 / cum                               # conv_post, k=7
    return int(math.ceil(rf)) + 1


@functools.lru_cache(maxsize=16)
def _window_vocoder(gen, fused: bool):
    # cached per (module config, path): a fresh jit closure per stream()
    # call would recompile every utterance (measured 6.7 s first-audio on
    # a tunneled v5e vs 17 ms warm). Variables are a traced argument so
    # one compile serves any checkpoint; the window size is baked into
    # the traced shape (one compile per distinct window).
    from fscl_tpu.ops.hifigan_fused import vocoder_apply
    return jax.jit(vocoder_apply(gen, fused))


def chunked_vocode(
    gen,
    variables,
    mel: jnp.ndarray,                       # (B, T_mel, n_mels)
    chunk: int = 64,
    halo: Optional[int] = None,
    hop: Optional[int] = None,
    fused: bool = True,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (start_sample, wav_chunk (B, chunk*hop)) left to right.

    halo/hop default to values derived from the generator config
    (generator_halo / generator_hop), so non-V1 upsample stacks get the
    right receptive-field cover and sample rate automatically.

    Concatenating the chunks equals vocoding the whole mel (right-padded
    to a chunk multiple) in one call: windows are clamped INSIDE the mel,
    so edge chunks share the true array edge and see the same per-layer
    conv-SAME zero padding the full computation applies there, while
    interior chunk centers sit >= halo frames from any window edge —
    beyond the generator's receptive field. (Zero-padding a left halo
    instead would feed layer-1+ bias-colored activations where the full
    computation pads zeros — measurably wrong for the first receptive
    field of audio.) Slice the concatenation to T_mel*hop (or per-sample
    mel_len*hop) downstream.
    """
    if halo is None:
        halo = generator_halo(gen)
        if not _has_halo_fields(gen):
            # DEFAULT_HALO covers HiFiGAN V1-sized receptive fields; an
            # arbitrary convnet (e.g. MelGAN) can reach further, which
            # would make chunked output silently diverge from the full
            # vocode. The CLI refuses non-HiFiGAN streaming; API callers
            # get a loud warning instead of silent divergence.
            import warnings
            warnings.warn(
                f"chunked_vocode: {type(gen).__name__} does not declare "
                f"HiFiGAN config fields; falling back to halo="
                f"{DEFAULT_HALO} mel frames, which is NOT guaranteed to "
                "cover this generator's receptive field. Pass an explicit "
                "halo and pin chunked==full equality for this module.",
                stacklevel=2)
    if hop is None:
        hop = generator_hop(gen)
    B, T, _ = mel.shape
    n_chunks = -(-T // chunk)
    Tp = n_chunks * chunk
    if Tp > T:
        mel = jnp.pad(mel, ((0, 0), (0, Tp - T), (0, 0)))
    window = min(chunk + 2 * halo, Tp)
    vocode = _window_vocoder(gen, fused)
    pending = []
    for c in range(n_chunks):
        # dispatch every window asynchronously before materializing any:
        # later chunks compute while earlier ones transfer to the host
        # (one device->host round trip per chunk otherwise serializes —
        # measured 107 ms/chunk over a tunneled v5e vs ~6 ms compute)
        start_w = min(max(c * chunk - halo, 0), Tp - window)
        off = c * chunk - start_w
        win = jax.lax.dynamic_slice_in_dim(mel, start_w, window, axis=1)
        wav = vocode(variables, win)        # (B, window*hop)
        if hop is None:
            hop = wav.shape[1] // window    # derive from the first window
        if wav.shape[1] != window * hop:
            raise ValueError(
                f"vocoder emits {wav.shape[1]} samples for a {window}-frame "
                f"window; expected window*hop = {window * hop}")
        pending.append((c * chunk * hop,
                        wav[:, off * hop:(off + chunk) * hop]))
    for start, wav in pending:
        yield start, np.asarray(wav)


def make_streaming_text2wav(
    system,
    state,
    vocoder_model,
    vocoder_variables,
    max_mel_len: int,
    chunk: int = 64,
    halo: Optional[int] = None,
    symbol_id=None,
    fused_vocoder: bool = True,
    **controls,
):
    """Returns stream(texts, src_lens, speaker_args, lang_ids) -> iterator
    of (start_sample, wav_chunk, mel_len). FastSpeech2 synthesis runs once
    (jitted, static bucket); audio then streams chunk-by-chunk through a
    single fixed-window jitted vocoder. First audio = synthesis + one
    window instead of synthesis + the whole utterance."""
    params, batch_stats = state.params, state.batch_stats

    @jax.jit
    def synth(texts, src_lens, speaker_args, lang_ids):
        out = system.synthesize(params, batch_stats, texts, src_lens,
                                max_mel_len, speaker_args, lang_ids,
                                symbol_id=symbol_id, **controls)
        return out.postnet_mel, out.mel_len

    def stream(texts, src_lens, speaker_args, lang_ids):
        mel, mel_len = synth(texts, src_lens, speaker_args, lang_ids)
        mel_len_np = np.asarray(mel_len)    # one device->host readback
        for start, wav in chunked_vocode(vocoder_model, vocoder_variables,
                                         mel, chunk=chunk, halo=halo,
                                         fused=fused_vocoder):
            yield start, wav, mel_len_np

    return stream
