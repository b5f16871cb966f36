"""Tacotron2-style text-to-unit (T2U) model with a lax.scan decoder.

Re-design of lightning/systems/t2u/tacotron2/tacot2u_model.py:13-362 for
TPU: the reference's per-step Python `while` loop with stateful attributes
(decode(), forward():293-330, inference():330-362) becomes a `lax.scan` over
a functional DecoderCell carrying (LSTM states, attention weights, cumulative
weights, context, previous prediction). Scheduled sampling (per-step
teacher-forcing coin flips) and the always-on prenet dropout (a Tacotron2
quirk the reference keeps: Prenet.forward uses training=True) draw from a
per-step folded PRNG key inside the scan. Inference runs the same scan for
max_decoder_ratio * L steps with an `<eos>`-finished flag per sample —
batched, unlike the reference's batch-1 inference.

Emits unit logits (not mels): d_unit embeddings in, n_units logits out.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fscl_tpu.ops.masking import length_mask

EOS_ID = 8   # reference: <eos> unit id (tacot2u_model.py:344, T2UDataset)


class T2UConfig(NamedTuple):
    n_units: int = 512
    d_unit: int = 256
    symbols_embedding_dim: int = 256
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
    max_decoder_ratio: int = 10


class Prenet(nn.Module):
    """2-layer ReLU prenet; dropout always active (tacot2u_model.py:104-110)."""
    sizes: Tuple[int, int] = (256, 256)

    @nn.compact
    def __call__(self, x, rng):
        for i, size in enumerate(self.sizes):
            x = nn.relu(nn.Dense(size, use_bias=False, name=f"fc_{i}")(x))
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
        return x


class LocationAttention(nn.Module):
    """Location-sensitive attention (tacot2u_model.py:32-90)."""
    cfg: T2UConfig

    @nn.compact
    def __call__(self, query, memory, processed_memory, attn_weights_cat,
                 memory_valid):
        c = self.cfg
        processed_query = nn.Dense(c.attention_dim, use_bias=False,
                                   name="query_layer")(query)[:, None]
        loc = nn.Conv(c.attention_location_n_filters,
                      (c.attention_location_kernel_size,), padding="SAME",
                      use_bias=False, name="location_conv")(
            attn_weights_cat.transpose(0, 2, 1))        # (B, T, n_filters)
        loc = nn.Dense(c.attention_dim, use_bias=False,
                       name="location_dense")(loc)
        energies = nn.Dense(1, use_bias=False, name="v")(
            jnp.tanh(processed_query + loc + processed_memory))[..., 0]
        energies = jnp.where(memory_valid, energies, -1e9)
        weights = jax.nn.softmax(energies, axis=1)
        context = jnp.einsum("bt,btd->bd", weights, memory,
                             preferred_element_type=jnp.float32).astype(memory.dtype)
        return context, weights


class T2UEncoder(nn.Module):
    """3x (conv5 + BN + relu + dropout) + BiLSTM (tacot2u_model.py:104-156)."""
    cfg: T2UConfig

    @nn.compact
    def __call__(self, emb_text, src_valid, deterministic: bool = True):
        c = self.cfg
        x = emb_text
        for i in range(c.encoder_n_convolutions):
            x = nn.Conv(c.encoder_embedding_dim, (c.encoder_kernel_size,),
                        padding="SAME", name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
            x = jnp.where(src_valid[..., None], x, 0.0)
        half = c.encoder_embedding_dim // 2
        # seq_lengths keeps the backward direction off the pad frames
        # (pack_padded_sequence parity, tacot2u_model.py:137-144)
        seq_lengths = jnp.sum(src_valid.astype(jnp.int32), axis=-1)
        fwd = nn.RNN(nn.OptimizedLSTMCell(half), name="lstm_fwd")(
            x, seq_lengths=seq_lengths)
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), name="lstm_bwd", reverse=True,
                     keep_order=True)(x, seq_lengths=seq_lengths)
        out = jnp.concatenate([fwd, bwd], axis=-1)
        return jnp.where(src_valid[..., None], out, 0.0)


class DecoderCell(nn.Module):
    """One decoder step (tacot2u_model.py:253-291 `decode`)."""
    cfg: T2UConfig

    @nn.compact
    def __call__(self, carry, decoder_input, memory, processed_memory,
                 memory_valid, rng, train: bool):
        c = self.cfg
        (attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, attn_ctx) = carry

        cell_input = jnp.concatenate([decoder_input, attn_ctx], axis=-1)
        attn_lstm = nn.OptimizedLSTMCell(c.attention_rnn_dim, name="attention_rnn")
        (attn_c, attn_h), _ = attn_lstm((attn_c, attn_h), cell_input)
        if train:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1 - c.p_attention_dropout, attn_h.shape)
            attn_h = jnp.where(keep, attn_h / (1 - c.p_attention_dropout), 0.0)

        attn_weights_cat = jnp.stack([attn_w, attn_w_cum], axis=1)  # (B,2,T)
        attn_ctx, attn_w = LocationAttention(c, name="attention_layer")(
            attn_h, memory, processed_memory, attn_weights_cat, memory_valid)
        attn_w_cum = attn_w_cum + attn_w

        dec_input = jnp.concatenate([attn_h, attn_ctx], axis=-1)
        dec_lstm = nn.OptimizedLSTMCell(c.decoder_rnn_dim, name="decoder_rnn")
        (dec_c, dec_h), _ = dec_lstm((dec_c, dec_h), dec_input)
        if train:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1 - c.p_decoder_dropout, dec_h.shape)
            dec_h = jnp.where(keep, dec_h / (1 - c.p_decoder_dropout), 0.0)

        hidden = nn.Dense(c.encoder_embedding_dim, name="linear_projection")(
            jnp.concatenate([dec_h, attn_ctx], axis=-1))
        logits = nn.Dense(c.n_units, name="final_proj")(hidden)
        new_carry = (attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, attn_ctx)
        return new_carry, (logits, attn_w)


class TacoT2U(nn.Module):
    """Full T2U: encoder + scan decoder. Takes pre-embedded text (the
    multilingual/FSCL embedding lives outside, like the FastSpeech2 head)."""
    cfg: T2UConfig

    def setup(self):
        self.encoder = T2UEncoder(self.cfg, name="encoder")
        self.unit_embedding = nn.Embed(self.cfg.n_units, self.cfg.d_unit,
                                       name="unit_embedding")
        self.prenet = Prenet((self.cfg.prenet_dim, self.cfg.prenet_dim),
                             name="prenet")
        self.cell = DecoderCell(self.cfg, name="decoder_cell")
        self.memory_layer = nn.Dense(self.cfg.attention_dim, use_bias=False,
                                     name="memory_layer")

    def _init_carry(self, B, T_mem, dtype):
        c = self.cfg
        z = lambda d: jnp.zeros((B, d), dtype)
        return (z(c.attention_rnn_dim), z(c.attention_rnn_dim),
                z(c.decoder_rnn_dim), z(c.decoder_rnn_dim),
                jnp.zeros((B, T_mem), dtype), jnp.zeros((B, T_mem), dtype),
                z(c.encoder_embedding_dim))

    def __call__(self, emb_text, src_lens, units, rng,
                 teacher_forcing_ratio: float = 1.0,
                 deterministic: bool = True):
        """Teacher-forced training forward (tacot2u_model.py:293-330).

        units: (B, T_out) target unit ids (with <eos> appended by the data
        layer). Returns (logits (B, T_out, n_units), alignments (B, T_out, L)).
        """
        B, L, _ = emb_text.shape
        T_out = units.shape[1]
        src_valid = length_mask(src_lens, L)
        memory = self.encoder(emb_text, src_valid, deterministic)
        processed_memory = self.memory_layer(memory)
        carry0 = self._init_carry(B, L, memory.dtype)

        # teacher inputs: GO zero frame + shifted unit embeddings
        teacher_emb = self.unit_embedding(units)                     # (B,T,d)
        go = jnp.zeros((B, 1, self.cfg.d_unit), teacher_emb.dtype)
        teacher_in = jnp.concatenate([go, teacher_emb[:, :-1]], axis=1)

        def step(mdl, carry, xs):
            t, teacher_t = xs
            prev_carry, prev_logits = carry
            step_rng = jax.random.fold_in(rng, t)
            r_tf, r_pre, r_cell = jax.random.split(step_rng, 3)
            use_teacher = jnp.logical_or(
                t == 0,
                jax.random.uniform(r_tf, ()) < teacher_forcing_ratio)
            pred_prev = jnp.argmax(prev_logits, axis=-1)
            model_in = mdl.unit_embedding(pred_prev)
            dec_in_raw = jnp.where(use_teacher, teacher_t, model_in)
            dec_in = mdl.prenet(dec_in_raw, r_pre)
            new_carry, (logits, attn_w) = mdl.cell(
                prev_carry, dec_in, memory, processed_memory, src_valid,
                r_cell, not deterministic)
            return (new_carry, logits), (logits, attn_w)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=0, out_axes=0)
        init_logits = jnp.zeros((B, self.cfg.n_units), memory.dtype)
        ts = jnp.arange(T_out)
        _, (logits, aligns) = scan(
            self, (carry0, init_logits),
            (ts, teacher_in.transpose(1, 0, 2)))
        return logits.transpose(1, 0, 2), aligns.transpose(1, 0, 2)

    def infer(self, emb_text, src_lens, rng, max_steps: Optional[int] = None):
        """Batched autoregressive inference (tacot2u_model.py:330-362):
        argmax decoding until <eos> (id 8), capped at max_decoder_ratio * L.
        Returns (logits, unit ids, lengths, alignments); positions after
        <eos> are masked to 0."""
        B, L, _ = emb_text.shape
        max_steps = max_steps or self.cfg.max_decoder_ratio * L
        src_valid = length_mask(src_lens, L)
        memory = self.encoder(emb_text, src_valid, True)
        processed_memory = self.memory_layer(memory)
        carry0 = self._init_carry(B, L, memory.dtype)

        def step(mdl, carry, t):
            prev_carry, prev_in, finished, n_steps = carry
            step_rng = jax.random.fold_in(rng, t)
            r_pre, r_cell = jax.random.split(step_rng)
            dec_in = mdl.prenet(prev_in, r_pre)
            new_carry, (logits, attn_w) = mdl.cell(
                prev_carry, dec_in, memory, processed_memory, src_valid,
                r_cell, False)
            pred = jnp.argmax(logits, axis=-1)
            now_finished = finished | (pred == EOS_ID)
            n_steps = n_steps + (~now_finished).astype(jnp.int32)
            next_in = mdl.unit_embedding(pred)
            return ((new_carry, next_in, now_finished, n_steps),
                    (logits, pred, ~now_finished, attn_w))

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        go = jnp.zeros((B, self.cfg.d_unit), memory.dtype)
        finished0 = jnp.zeros((B,), bool)
        (_, _, _, n_steps), (logits, preds, active, aligns) = scan(
            self, (carry0, go, finished0, jnp.zeros((B,), jnp.int32)),
            jnp.arange(max_steps))
        logits = logits.transpose(1, 0, 2)
        preds = jnp.where(active.T, preds.T, 0)
        return logits, preds, n_steps, aligns.transpose(1, 0, 2)
