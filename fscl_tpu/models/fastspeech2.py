"""Headless multilingual FastSpeech2 (flax).

Assembly matching lightning/model/fastspeech2m.py:19-163: pre-embedded text
-> Encoder -> (+speaker embedding, optionally episode-averaged) -> (+language
embedding unless disabled) -> VarianceAdaptor -> (+speaker embedding) ->
Decoder -> mel linear -> PostNet residual. "Headless" = the phoneme
embedding lookup/generation lives outside (MultilingualEmbedding or the FSCL
codebook), so meta-episodes can swap tables functionally.

Submodules are set up by name so the ADA flows can run `decode` standalone
(the reference uses a decoder-input forward hook + partial forward,
TransEmbADA.py:42-76 — here `decoder_input` is simply part of the output).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from fscl_tpu.core.config import ModelConfig
from fscl_tpu.core.stats import GlobalStats
from fscl_tpu.nn.fft_block import Decoder, Encoder, PostNet
from fscl_tpu.nn.speaker_encoder import LanguageEncoder, SpeakerEncoder
from fscl_tpu.nn.variance_adaptor import VarianceAdaptor
from fscl_tpu.ops.masking import length_mask


class FastSpeech2Output(NamedTuple):
    """10-tuple contract of fastspeech2m.py:150-163 (masks as valid-masks),
    plus `decoder_input` for the ADA matching loss."""
    mel: jnp.ndarray
    postnet_mel: jnp.ndarray
    pitch_prediction: jnp.ndarray
    energy_prediction: jnp.ndarray
    log_duration_prediction: jnp.ndarray
    duration_rounded: jnp.ndarray
    src_valid: jnp.ndarray
    mel_valid: jnp.ndarray
    src_len: jnp.ndarray
    mel_len: jnp.ndarray
    decoder_input: Optional[jnp.ndarray] = None


class FastSpeech2(nn.Module):
    cfg: ModelConfig
    stats: GlobalStats

    def setup(self):
        cfg = self.cfg
        t = cfg.transformer
        # computation dtype for the heavy matmuls/convs; params and layer
        # norms stay f32 (config.compute_dtype="bfloat16" halves the
        # activation traffic the HBM-bound backward pass re-reads)
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)
        self.encoder = Encoder(
            t.encoder_layer, t.encoder_hidden, t.encoder_head,
            t.conv_filter_size, t.conv_kernel_size, t.encoder_dropout,
            cfg.max_seq_len, cfg.remat, dtype, name="encoder")
        self.variance_adaptor = VarianceAdaptor(cfg, self.stats,
                                                name="variance_adaptor")
        self.decoder = Decoder(
            t.decoder_layer, t.decoder_hidden, t.decoder_head,
            t.conv_filter_size, t.conv_kernel_size, t.decoder_dropout,
            cfg.max_seq_len, cfg.remat, dtype, name="decoder")
        self.mel_linear = nn.Dense(cfg.audio.n_mels, name="mel_linear")
        self.postnet = PostNet(cfg.audio.n_mels, dtype=dtype, name="postnet")
        if cfg.multi_speaker:
            self.speaker_emb = SpeakerEncoder(
                cfg.speaker.emb_type, cfg.speaker.n_speakers,
                t.encoder_hidden, name="speaker_emb")
        if cfg.multi_lingual:
            self.language_emb = LanguageEncoder(
                cfg.n_languages, t.encoder_hidden, name="language_emb")

    def predict_mel_len(self, emb_texts, src_lens, speaker_args=None,
                        lang_args=None, average_spk_emb: bool = False,
                        d_control: float = 1.0):
        """Pass 1 of bucketed synthesis: predicted total mel frames per
        sample — encoder + duration predictor only (no length regulation,
        no decoder), so the caller can pick the smallest adequate static
        mel bucket for the full pass."""
        cfg = self.cfg
        B, L, _ = emb_texts.shape
        src_valid = length_mask(src_lens, L)
        x = self.encoder(emb_texts, src_valid, True)
        if cfg.multi_speaker and speaker_args is not None:
            spk_emb = self.speaker_emb(speaker_args)
            if average_spk_emb:
                spk_emb = jnp.broadcast_to(
                    jnp.mean(spk_emb, axis=0, keepdims=True), spk_emb.shape)
            x = x + spk_emb[:, None, :]
        if cfg.multi_lingual and cfg.use_lang_id and lang_args is not None:
            x = x + self.language_emb(lang_args)[:, None, :]
        log_d = self.variance_adaptor.predict_log_durations(x, src_valid)
        dur = jnp.maximum(jnp.round(jnp.exp(log_d) - 1.0) * d_control, 0.0)
        dur = jnp.where(src_valid, dur, 0.0)
        return jnp.sum(dur.astype(jnp.int32), axis=-1)

    def decode(self, x, mel_valid, deterministic: bool = True):
        """Decoder -> mel_linear -> postnet residual; standalone entry for
        ADA reconstruction (TransEmbADA.decoder_forard)."""
        h = self.decoder(x, mel_valid, deterministic)
        mel = self.mel_linear(h)
        postnet_mel = mel + self.postnet(mel, deterministic)
        return mel, postnet_mel

    def __call__(
        self,
        emb_texts,                 # (B, L, D) pre-embedded phonemes
        src_lens,                  # (B,)
        max_mel_len: int,
        speaker_args=None,         # (B,) ids or (B, N, T, 40) mel slices
        mel_lens=None,             # (B,) or None at inference
        p_targets=None, e_targets=None, d_targets=None,
        lang_args=None,            # (B,) language ids
        p_control: float = 1.0, e_control: float = 1.0, d_control: float = 1.0,
        average_spk_emb: bool = False,
        deterministic: bool = True,
    ) -> FastSpeech2Output:
        cfg = self.cfg
        B, L, _ = emb_texts.shape
        src_valid = length_mask(src_lens, L)
        mel_valid = (length_mask(mel_lens, max_mel_len)
                     if mel_lens is not None else None)

        x = self.encoder(emb_texts, src_valid, deterministic)

        spk_emb = None
        if cfg.multi_speaker and speaker_args is not None:
            spk_emb = self.speaker_emb(speaker_args)
            if average_spk_emb:
                # episode-level average (fastspeech2m.py:86-88)
                spk_emb = jnp.broadcast_to(
                    jnp.mean(spk_emb, axis=0, keepdims=True), spk_emb.shape)
            x = x + spk_emb[:, None, :]

        if cfg.multi_lingual and cfg.use_lang_id and lang_args is not None:
            x = x + self.language_emb(lang_args)[:, None, :]

        va = self.variance_adaptor(
            x, src_valid, max_mel_len, mel_valid,
            p_targets, e_targets, d_targets,
            p_control, e_control, d_control, deterministic,
        )
        x, mel_valid, mel_len = va.x, va.mel_valid, va.mel_len

        if spk_emb is not None:
            x = x + spk_emb[:, None, :]

        decoder_input = x
        mel, postnet_mel = self.decode(x, mel_valid, deterministic)

        return FastSpeech2Output(
            mel=mel,
            postnet_mel=postnet_mel,
            pitch_prediction=va.pitch_prediction,
            energy_prediction=va.energy_prediction,
            log_duration_prediction=va.log_duration_prediction,
            duration_rounded=va.duration_rounded,
            src_valid=src_valid,
            mel_valid=mel_valid,
            src_len=src_lens,
            mel_len=mel_len,
            decoder_input=decoder_input,
        )
