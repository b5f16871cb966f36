"""Fused serving pipeline: text -> mel -> wav in ONE jitted call.

The reference serves in two hops (FastSpeech2 inference, then the vocoder
wrapper over the saved mel — utils/log.py synth + dlhlp vocoders). On TPU
fusing both models into one XLA program avoids materializing the mel on
the host and lets the compiler overlap the decoder's tail with the
vocoder's head. Static mel bucket per callable (same rule as
synthesize_bucketed).
"""
from __future__ import annotations

import jax


def make_text2wav(system, state, vocoder_model, vocoder_variables,
                  max_mel_len: int, symbol_id=None, fused_vocoder=True,
                  **controls):
    """Returns jitted (texts, src_lens, speaker_args, lang_ids) ->
    (wav (B, max_mel_len*hop), mel_len (B,)). Trailing samples beyond
    mel_len*hop are vocoded padding — slice with mel_len before writing.

    fused_vocoder routes a HiFiGANGenerator through the MXU-dense serving
    ops (ops/hifigan_fused.py; 1.4x the module apply on a v5e, numerics
    within the bf16-path tolerance class). Other vocoders use .apply."""
    params, batch_stats = state.params, state.batch_stats

    from fscl_tpu.ops.hifigan_fused import vocoder_apply
    vocode = vocoder_apply(vocoder_model, fused_vocoder)

    @jax.jit
    def text2wav(texts, src_lens, speaker_args, lang_ids):
        out = system.synthesize(params, batch_stats, texts, src_lens,
                                max_mel_len, speaker_args, lang_ids,
                                symbol_id=symbol_id, **controls)
        return vocode(vocoder_variables, out.postnet_mel), out.mel_len

    return text2wav
