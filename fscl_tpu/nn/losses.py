"""Losses.

Masked-mean equivalents of lightning/model/loss.py: the reference
masked_selects valid positions then takes unweighted means; `masked_mean`
reproduces that exactly with static shapes (sum over valid / count).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from fscl_tpu.ops.masking import masked_mean


class FastSpeech2LossOutput(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    postnet_mel: jnp.ndarray
    pitch: jnp.ndarray
    energy: jnp.ndarray
    duration: jnp.ndarray

    def as_dict(self) -> Dict[str, jnp.ndarray]:
        return {
            "Total Loss": self.total, "Mel Loss": self.mel,
            "Mel-Postnet Loss": self.postnet_mel, "Pitch Loss": self.pitch,
            "Energy Loss": self.energy, "Duration Loss": self.duration,
        }


def fastspeech2_loss(
    mel_pred, postnet_mel_pred,          # (B, T, n_mels)
    pitch_pred, energy_pred,             # (B, L) or (B, T) per feature level
    log_d_pred,                          # (B, L)
    mel_target, pitch_target, energy_target, duration_target,
    src_valid, mel_valid,
    pitch_level: str = "phoneme_level",
    energy_level: str = "phoneme_level",
) -> FastSpeech2LossOutput:
    """FastSpeech2Loss (loss.py:15-88): L1 mel + L1 postnet + MSE pitch/
    energy/log-duration over valid positions."""
    log_d_target = jnp.log(duration_target.astype(jnp.float32) + 1.0)

    p_valid = src_valid if pitch_level == "phoneme_level" else mel_valid
    e_valid = src_valid if energy_level == "phoneme_level" else mel_valid

    mel_l = masked_mean(jnp.abs(mel_pred - mel_target), mel_valid)
    post_l = masked_mean(jnp.abs(postnet_mel_pred - mel_target), mel_valid)
    pitch_l = masked_mean((pitch_pred - pitch_target) ** 2, p_valid)
    energy_l = masked_mean((energy_pred - energy_target) ** 2, e_valid)
    dur_l = masked_mean((log_d_pred - log_d_target) ** 2, src_valid)
    total = mel_l + post_l + pitch_l + energy_l + dur_l
    return FastSpeech2LossOutput(total, mel_l, post_l, pitch_l, energy_l, dur_l)


def fastspeech2_ada_loss(mel_pred, postnet_mel_pred, mel_target, mel_valid):
    """FastSpeech2ADALoss (loss.py:105-140): mel losses only."""
    mel_l = masked_mean(jnp.abs(mel_pred - mel_target), mel_valid)
    post_l = masked_mean(jnp.abs(postnet_mel_pred - mel_target), mel_valid)
    return mel_l + post_l, mel_l, post_l


def framewise_ce_loss(logits, targets, ignore_index: int = 0):
    """PhonemeClassificationLoss / PRFramewiseLoss: cross-entropy over frames
    ignoring PAD (loss.py:91-102, phoneme_recognition/loss.py:8-19)."""
    valid = targets != ignore_index
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(targets, 0))
    total = jnp.sum(jnp.where(valid, ce, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


def framewise_accuracy(logits, targets, ignore_index: int = 0):
    valid = targets != ignore_index
    correct = (jnp.argmax(logits, axis=-1) == targets) & valid
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)
