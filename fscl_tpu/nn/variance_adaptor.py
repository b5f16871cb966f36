"""Variance adaptor: duration/pitch/energy prediction + length regulation.

Re-design of lightning/model/modules.py:18-298 with the Python-loop length
regulator replaced by the static-shape gather in ops.length_regulator, and
torch.bucketize replaced by ops.bucketize.digitize (a compare-reduce fusion;
jnp.digitize's binary search serializes on TPU) over precomputed bin edges
derived from the global normalization stats (modules.py:41-75).
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import ModelConfig
from fscl_tpu.core.stats import GlobalStats
from fscl_tpu.ops.bucketize import digitize
from fscl_tpu.ops.length_regulator import regulate_lengths
from fscl_tpu.ops.masking import length_mask


def variance_bins(stats: GlobalStats, cfg: ModelConfig) -> tuple:
    """Quantization bin edges ((n_bins-1,) each) for pitch and energy."""
    n_bins = cfg.variance_embedding.n_bins
    p = stats.pitch
    e = stats.energy
    p_min, p_max = (p.normalized_range() if cfg.variance.pitch_normalization
                    else (p.min, p.max))
    e_min, e_max = (e.normalized_range() if cfg.variance.energy_normalization
                    else (e.min, e.max))

    def edges(vmin, vmax, quant):
        if quant == "log":
            return np.exp(np.linspace(np.log(vmin), np.log(vmax), n_bins - 1))
        return np.linspace(vmin, vmax, n_bins - 1)

    return (
        edges(p_min, p_max, cfg.variance_embedding.pitch_quantization).astype(np.float32),
        edges(e_min, e_max, cfg.variance_embedding.energy_quantization).astype(np.float32),
    )


class VariancePredictor(nn.Module):
    """2x (conv1d -> relu -> LN -> dropout) -> linear (modules.py:199-253)."""
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, valid=None, deterministic: bool = True):
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    name="conv1d_1")(x)
        h = nn.relu(h)
        h = nn.LayerNorm(name="layer_norm_1")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    name="conv1d_2")(h)
        h = nn.relu(h)
        h = nn.LayerNorm(name="layer_norm_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.Dense(1, name="linear_layer")(h)[..., 0]
        if valid is not None:
            out = jnp.where(valid, out, 0.0)
        return out


class VarianceAdaptorOutput(NamedTuple):
    x: jnp.ndarray                 # (B, T_mel, D) frame-level features
    pitch_prediction: jnp.ndarray
    energy_prediction: jnp.ndarray
    log_duration_prediction: jnp.ndarray
    duration_rounded: jnp.ndarray
    mel_len: jnp.ndarray           # (B,)
    mel_valid: jnp.ndarray         # (B, T_mel) bool


class VarianceAdaptor(nn.Module):
    """Semantics of modules.py:104-160 with static max_mel_len."""
    cfg: ModelConfig
    stats: GlobalStats

    def setup(self):
        cfg = self.cfg
        vp = cfg.variance_predictor
        self.duration_predictor = VariancePredictor(
            vp.filter_size, vp.kernel_size, vp.dropout,
            name="duration_predictor")
        self.pitch_predictor = VariancePredictor(
            vp.filter_size, vp.kernel_size, vp.dropout,
            name="pitch_predictor")
        self.energy_predictor = VariancePredictor(
            vp.filter_size, vp.kernel_size, vp.dropout,
            name="energy_predictor")
        n_bins = cfg.variance_embedding.n_bins
        d_model = cfg.transformer.encoder_hidden
        self.pitch_embedding = nn.Embed(n_bins, d_model,
                                        name="pitch_embedding")
        self.energy_embedding = nn.Embed(n_bins, d_model,
                                         name="energy_embedding")

    def predict_log_durations(self, x, src_valid, deterministic: bool = True):
        """Standalone duration prediction (pass 1 of bucketed synthesis)."""
        return self.duration_predictor(x, src_valid, deterministic)

    def __call__(
        self,
        x,                       # (B, L, D)
        src_valid,               # (B, L) bool
        max_mel_len: int,
        mel_valid=None,          # (B, T) bool or None (inference)
        pitch_target=None,
        energy_target=None,
        duration_target=None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        deterministic: bool = True,
    ) -> VarianceAdaptorOutput:
        cfg = self.cfg
        pitch_edges, energy_edges = variance_bins(self.stats, cfg)
        pitch_edges = jnp.asarray(pitch_edges)
        energy_edges = jnp.asarray(energy_edges)

        dur_pred = self.duration_predictor
        pit_pred = self.pitch_predictor
        ene_pred = self.energy_predictor
        pitch_emb_table = self.pitch_embedding
        energy_emb_table = self.energy_embedding

        log_d_prediction = dur_pred(x, src_valid, deterministic)

        def add_variance(feats, predictor, emb_table, edges, target, valid, control):
            prediction = predictor(feats, valid, deterministic)
            if target is not None:
                emb = emb_table(digitize(target, edges))
            else:
                prediction = prediction * control
                emb = emb_table(digitize(prediction, edges))
            return prediction, emb

        pitch_prediction = energy_prediction = None
        if cfg.variance.pitch_feature == "phoneme_level":
            pitch_prediction, emb = add_variance(
                x, pit_pred, pitch_emb_table, pitch_edges, pitch_target,
                src_valid, p_control)
            x = x + emb
        if cfg.variance.energy_feature == "phoneme_level":
            energy_prediction, emb = add_variance(
                x, ene_pred, energy_emb_table, energy_edges, energy_target,
                src_valid, e_control)
            x = x + emb

        if duration_target is not None:
            duration_rounded = duration_target
        else:
            duration_rounded = jnp.maximum(
                jnp.round(jnp.exp(log_d_prediction) - 1.0) * d_control, 0.0
            )
            duration_rounded = jnp.where(src_valid, duration_rounded, 0.0)
            duration_rounded = duration_rounded.astype(jnp.int32)

        x, mel_len = regulate_lengths(x, duration_rounded, max_mel_len)
        mel_len = jnp.minimum(mel_len, max_mel_len)
        if mel_valid is None:
            mel_valid = length_mask(mel_len, max_mel_len)

        if cfg.variance.pitch_feature == "frame_level":
            pitch_prediction, emb = add_variance(
                x, pit_pred, pitch_emb_table, pitch_edges, pitch_target,
                mel_valid, p_control)
            x = x + emb
        if cfg.variance.energy_feature == "frame_level":
            energy_prediction, emb = add_variance(
                x, ene_pred, energy_emb_table, energy_edges, energy_target,
                mel_valid, e_control)
            x = x + emb

        return VarianceAdaptorOutput(
            x=x,
            pitch_prediction=pitch_prediction,
            energy_prediction=energy_prediction,
            log_duration_prediction=log_d_prediction,
            duration_rounded=duration_rounded,
            mel_len=mel_len,
            mel_valid=mel_valid,
        )
