"""bf16 activation policy vs f32: training loss parity (VERDICT r2 #2).

ModelConfig.compute_dtype="bfloat16" runs matmul/conv computation and
saved activations in bf16 with f32 params/norms. The policy is only
shippable if the optimization trajectory matches f32 closely — pinned
here on the supervised FastSpeech2 train step over the reference's
optimizer settings (Adam beta=(0.9,0.98), warmup — config/train/fscl.yaml)."""
import dataclasses

import jax
import numpy as np
import pytest

from fscl_tpu.core.config import (
    ModelConfig, OptimConfig, SpeakerConfig, TransformerConfig,
)
from fscl_tpu.data.batch import Batch
from fscl_tpu.systems.baseline import BaselineSystem

CFG = ModelConfig(
    transformer=TransformerConfig(
        encoder_layer=2, decoder_layer=2, encoder_hidden=64,
        decoder_hidden=64, conv_filter_size=128, encoder_head=2,
        decoder_head=2, encoder_dropout=0.0, decoder_dropout=0.0),
    max_seq_len=64, speaker=SpeakerConfig(n_speakers=4))
N_SYM = 40


def _batch(rng, B=4, L=12, T=48):
    dur = rng.integers(1, 4, (B, L)).astype(np.int32)
    return Batch(
        speaker_args=np.zeros(B, np.int32),
        texts=rng.integers(1, N_SYM, (B, L)).astype(np.int32),
        src_lens=np.full((B,), L, np.int32),
        mels=rng.normal(size=(B, T, 80)).astype(np.float32),
        mel_lens=np.minimum(dur.sum(1), T).astype(np.int32),
        pitches=rng.normal(size=(B, L)).astype(np.float32),
        energies=rng.normal(size=(B, L)).astype(np.float32),
        durations=dur, lang_ids=np.zeros(B, np.int32))


def _train_curve(compute_dtype: str, n_steps: int = 25):
    cfg = dataclasses.replace(CFG, compute_dtype=compute_dtype)
    system = BaselineSystem(
        cfg, OptimConfig(lr=2e-3, betas=(0.9, 0.98), warmup_step=10,
                         anneal_steps=()),
        (("en", N_SYM),))
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    state = system.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(system.train_step)
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["Total Loss"]))
    return np.asarray(losses)


def test_bf16_training_matches_f32_trajectory():
    f32 = _train_curve("float32")
    bf16 = _train_curve("bfloat16")
    assert np.isfinite(bf16).all()
    # same start (params are f32-initialized identically, first loss is
    # forward-only): bf16 rounding only
    assert abs(bf16[0] - f32[0]) / f32[0] < 0.02, (bf16[0], f32[0])
    # both optimize, and the final losses agree within a few percent —
    # bf16 is a numerics policy, not a different optimization problem
    assert f32[-1] < f32[0] and bf16[-1] < bf16[0]
    assert abs(bf16[-1] - f32[-1]) / f32[-1] < 0.08, (bf16[-1], f32[-1])
    # no step diverges wildly from the f32 curve
    rel = np.abs(bf16 - f32) / np.maximum(np.abs(f32), 1e-3)
    assert rel.max() < 0.15, rel.max()
