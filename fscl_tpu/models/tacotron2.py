"""Full mel Tacotron2 (kept alongside the T2U variant, as the reference
keeps lightning/systems/t2u/tacotron2/model.py): location-sensitive-attention
LSTM decoder emitting mel frames (n_frames_per_step at a time) + stop gate,
with a conv postnet — as a lax.scan, sharing the encoder/attention/prenet
modules of the T2U model.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fscl_tpu.models.tacotron2_t2u import (
    LocationAttention, Prenet, T2UConfig, T2UEncoder,
)
from fscl_tpu.nn.fft_block import PostNet
from fscl_tpu.ops.masking import length_mask


class Tacotron2Config(NamedTuple):
    n_mels: int = 80
    n_frames_per_step: int = 3
    symbols_embedding_dim: int = 512
    encoder_embedding_dim: int = 512
    encoder_n_convolutions: int = 3
    encoder_kernel_size: int = 5
    prenet_dim: int = 256
    attention_rnn_dim: int = 1024
    decoder_rnn_dim: int = 1024
    attention_dim: int = 128
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1
    gate_threshold: float = 0.5
    max_decoder_ratio: int = 10

    def as_t2u(self) -> T2UConfig:
        return T2UConfig(
            n_units=1, d_unit=self.n_mels * self.n_frames_per_step,
            symbols_embedding_dim=self.symbols_embedding_dim,
            encoder_embedding_dim=self.encoder_embedding_dim,
            encoder_n_convolutions=self.encoder_n_convolutions,
            encoder_kernel_size=self.encoder_kernel_size,
            prenet_dim=self.prenet_dim,
            attention_rnn_dim=self.attention_rnn_dim,
            decoder_rnn_dim=self.decoder_rnn_dim,
            attention_dim=self.attention_dim,
            attention_location_n_filters=self.attention_location_n_filters,
            attention_location_kernel_size=self.attention_location_kernel_size,
        )


class Tacotron2(nn.Module):
    cfg: Tacotron2Config

    def setup(self):
        c = self.cfg
        self.encoder = T2UEncoder(c.as_t2u(), name="encoder")
        self.prenet = Prenet((c.prenet_dim, c.prenet_dim), name="prenet")
        self.memory_layer = nn.Dense(c.attention_dim, use_bias=False,
                                     name="memory_layer")
        self.attention_rnn = nn.OptimizedLSTMCell(
            c.attention_rnn_dim, name="attention_rnn")
        self.attention_layer = LocationAttention(
            c.as_t2u(), name="attention_layer")
        self.decoder_rnn = nn.OptimizedLSTMCell(
            c.decoder_rnn_dim, name="decoder_rnn")
        self.linear_projection = nn.Dense(
            c.n_mels * c.n_frames_per_step, name="linear_projection")
        self.gate_layer = nn.Dense(1, name="gate_layer")
        self.postnet = PostNet(c.n_mels, name="postnet")

    def _init_carry(self, B, T_mem, dtype):
        c = self.cfg
        z = lambda d: jnp.zeros((B, d), dtype)
        return (z(c.attention_rnn_dim), z(c.attention_rnn_dim),
                z(c.decoder_rnn_dim), z(c.decoder_rnn_dim),
                jnp.zeros((B, T_mem), dtype), jnp.zeros((B, T_mem), dtype),
                z(c.encoder_embedding_dim))

    def _decode_step(self, carry, dec_in, memory, processed_memory,
                     src_valid, rng, train):
        c = self.cfg
        (attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, attn_ctx) = carry
        cell_in = jnp.concatenate([dec_in, attn_ctx], axis=-1)
        (attn_c, attn_h), _ = self.attention_rnn((attn_c, attn_h), cell_in)
        if train:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1 - c.p_attention_dropout,
                                        attn_h.shape)
            attn_h = jnp.where(keep, attn_h / (1 - c.p_attention_dropout), 0.0)
        attn_cat = jnp.stack([attn_w, attn_w_cum], axis=1)
        attn_ctx, attn_w = self.attention_layer(
            attn_h, memory, processed_memory, attn_cat, src_valid)
        attn_w_cum = attn_w_cum + attn_w
        dec_in2 = jnp.concatenate([attn_h, attn_ctx], axis=-1)
        (dec_c, dec_h), _ = self.decoder_rnn((dec_c, dec_h), dec_in2)
        if train:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1 - c.p_decoder_dropout,
                                        dec_h.shape)
            dec_h = jnp.where(keep, dec_h / (1 - c.p_decoder_dropout), 0.0)
        hc = jnp.concatenate([dec_h, attn_ctx], axis=-1)
        frames = self.linear_projection(hc)              # (B, n_mels * r)
        gate = self.gate_layer(hc)[..., 0]
        carry = (attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, attn_ctx)
        return carry, frames, gate, attn_w

    def __call__(self, emb_text, src_lens, mels, rng,
                 deterministic: bool = True):
        """Teacher-forced: mels (B, T_mel, n_mels); T_mel must be a multiple
        of n_frames_per_step. Returns (mel, postnet_mel, gate_logits,
        alignments)."""
        c = self.cfg
        B, L, _ = emb_text.shape
        T = mels.shape[1]
        r = c.n_frames_per_step
        n_steps = T // r
        src_valid = length_mask(src_lens, L)
        memory = self.encoder(emb_text, src_valid, deterministic)
        processed = self.memory_layer(memory)
        carry0 = self._init_carry(B, L, memory.dtype)

        # teacher inputs: GO zeros + last frame of each previous step group
        grouped = mels.reshape(B, n_steps, r * c.n_mels)
        go = jnp.zeros((B, 1, r * c.n_mels), mels.dtype)
        teacher = jnp.concatenate([go, grouped[:, :-1]], axis=1)
        # prenet consumes only the most recent frame (n_mels dims)
        teacher_last = teacher[..., -c.n_mels:]

        def step(mdl, carry, xs):
            t, teach = xs
            step_rng = jax.random.fold_in(rng, t)
            r_pre, r_cell = jax.random.split(step_rng)
            dec_in = mdl.prenet(teach, r_pre)
            carry, frames, gate, attn_w = mdl._decode_step(
                carry, dec_in, memory, processed, src_valid, r_cell,
                not deterministic)
            return carry, (frames, gate, attn_w)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        _, (frames, gates, aligns) = scan(
            self, carry0,
            (jnp.arange(n_steps), teacher_last.transpose(1, 0, 2)))
        mel = frames.transpose(1, 0, 2).reshape(B, T, c.n_mels)
        postnet_mel = mel + self.postnet(mel, deterministic)
        return mel, postnet_mel, gates.T, aligns.transpose(1, 0, 2)

    def infer(self, emb_text, src_lens, rng, max_steps: Optional[int] = None):
        c = self.cfg
        B, L, _ = emb_text.shape
        max_steps = max_steps or c.max_decoder_ratio * L
        src_valid = length_mask(src_lens, L)
        memory = self.encoder(emb_text, src_valid, True)
        processed = self.memory_layer(memory)
        carry0 = self._init_carry(B, L, memory.dtype)

        def step(mdl, state, t):
            carry, prev_last, finished, n = state
            step_rng = jax.random.fold_in(rng, t)
            r_pre, r_cell = jax.random.split(step_rng)
            dec_in = mdl.prenet(prev_last, r_pre)
            carry, frames, gate, attn_w = mdl._decode_step(
                carry, dec_in, memory, processed, src_valid, r_cell, False)
            stop = jax.nn.sigmoid(gate) > c.gate_threshold
            now_finished = finished | stop
            n = n + (~now_finished).astype(jnp.int32)
            last = frames[..., -c.n_mels:]
            return ((carry, last, now_finished, n),
                    (frames, ~now_finished, attn_w))

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        go = jnp.zeros((B, c.n_mels), memory.dtype)
        (_, _, _, n_steps), (frames, active, aligns) = scan(
            self, (carry0, go, jnp.zeros((B,), bool),
                   jnp.zeros((B,), jnp.int32)),
            jnp.arange(max_steps))
        T = max_steps * c.n_frames_per_step
        mel = frames.transpose(1, 0, 2).reshape(B, T, c.n_mels)
        mel = jnp.where(
            jnp.repeat(active.T, c.n_frames_per_step, axis=1)[..., None],
            mel, 0.0)
        postnet_mel = mel + self.postnet(mel, True)
        return mel, postnet_mel, n_steps * c.n_frames_per_step, \
            aligns.transpose(1, 0, 2)
