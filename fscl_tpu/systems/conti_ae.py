"""ContiAE + semi-supervised systems (long-tail of SURVEY §2.6).

- ContiAESystem ("conti-ae", lightning/systems/language/ContiAE.py:16-133):
  reconstruct speech from a continuous SSL layer — linear embed of the
  (layer-pinned) SSL features, nearest-neighbor interpolation from the 50 Hz
  SSL frame rate to the mel frame rate, then the FastSpeech2 decoder stack.
- SemiTransEmbSystem ("semi-fscl", SemiTransEmb.py, deprecated in the
  reference): supervised FSCL episode loss + unsupervised ContiAE-style
  reconstruction on an unlabeled stream, jointly.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import ModelConfig, OptimConfig
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.core.stats import DEFAULT_STATS, GlobalStats
from fscl_tpu.models.fastspeech2 import FastSpeech2
from fscl_tpu.models.hubert import SSLUpstream, make_upstream
from fscl_tpu.ops.masking import length_mask, masked_mean
from fscl_tpu.systems.base import System
from fscl_tpu.systems.fscl import Episode, TransEmbSystem


class ContiAEBatch(NamedTuple):
    wavs: np.ndarray          # (B, T_wav) 16 kHz
    wav_lens: np.ndarray
    mels: np.ndarray          # (B, T_mel, 80) targets
    mel_lens: np.ndarray


def interpolate_frames(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Nearest-neighbor time interpolation (B, T, D) -> (B, target_len, D)
    (ContiAE interpolates SSL frames to mel length)."""
    T = x.shape[1]
    idx = jnp.clip(
        jnp.round(jnp.arange(target_len) * (T / target_len)).astype(jnp.int32),
        0, T - 1)
    return x[:, idx]


@SYSTEMS.register("conti-ae")
class ContiAESystem(System):
    def __init__(self, model_cfg: ModelConfig, optim_cfg: OptimConfig,
                 stats: GlobalStats = DEFAULT_STATS,
                 upstream: Optional[SSLUpstream] = None,
                 layer_idx: int = 0):
        super().__init__(optim_cfg)
        self.model_cfg = model_cfg
        self.layer_idx = layer_idx
        self.upstream = upstream or make_upstream(model_cfg.upstream.name, model_cfg.upstream)
        self.model = FastSpeech2(model_cfg, stats)
        self.embed = nn.Dense(model_cfg.transformer.encoder_hidden)
        self.upstream_params: Optional[Dict[str, Any]] = None

    def init_upstream(self, rng, example_wav):
        from fscl_tpu.models.hubert import storage_cast
        from fscl_tpu.systems.base import jit_init
        self.upstream_params = storage_cast(
            jit_init(self.upstream)(rng, example_wav),
            self.model_cfg.upstream.compute_dtype)

    def extract_layer(self, wavs, wav_lens, upstream_params=None):
        from fscl_tpu.models.hubert import frozen_upstream_features
        if upstream_params is None:
            upstream_params = self.upstream_params
        valid = length_mask(wav_lens, wavs.shape[-1])
        fwd = getattr(self, "upstream_forward", None) \
            or frozen_upstream_features
        hidden, frame_valid = fwd(
            self.upstream, upstream_params, wavs, valid,
            self.model_cfg.upstream.compute_dtype)
        return hidden[:, :, self.layer_idx], frame_valid

    def init_variables(self, rng, batch: ContiAEBatch) -> Dict[str, Any]:
        r1, r2, r3 = jax.random.split(rng, 3)
        if self.upstream_params is None:
            self.init_upstream(r1, jnp.asarray(batch.wavs))
        from fscl_tpu.systems.base import jit_frozen_extract
        feats, _ = jit_frozen_extract(
            self.extract_layer, self.upstream_params,
            jnp.asarray(batch.wavs), jnp.asarray(batch.wav_lens))
        emb_vars = self.embed.init(r2, feats)
        x = self.embed.apply(emb_vars, feats)
        x = interpolate_frames(x, batch.mels.shape[1])
        mel_valid = length_mask(jnp.asarray(batch.mel_lens),
                                batch.mels.shape[1])
        dec_vars = self.model.init(
            r3, x, mel_valid, method=FastSpeech2.decode)
        return {"params": {"embed": emb_vars["params"],
                           "model": dec_vars["params"]},
                "frozen": {"upstream": self.upstream_params},
                **({"batch_stats": {"model": dec_vars["batch_stats"]}}
                   if "batch_stats" in dec_vars else {})}

    def loss_and_metrics(self, params, batch_stats, batch: ContiAEBatch,
                         rng, train, frozen=None):
        feats, _ = self.extract_layer(
            batch.wavs, batch.wav_lens,
            frozen.get("upstream") if frozen else None)
        x = self.embed.apply({"params": params["embed"]}, feats)
        x = interpolate_frames(x, batch.mels.shape[1])
        mel_valid = length_mask(batch.mel_lens, batch.mels.shape[1])
        model_vars = {"params": params["model"]}
        if batch_stats is not None:
            model_vars["batch_stats"] = batch_stats["model"]
        mel, postnet_mel = self.model.apply(
            model_vars, x, mel_valid, True, method=FastSpeech2.decode)
        mel_l = masked_mean(jnp.abs(mel - batch.mels), mel_valid)
        post_l = masked_mean(jnp.abs(postnet_mel - batch.mels), mel_valid)
        total = mel_l + post_l
        return total, ({"Total Loss": total, "Mel Loss": mel_l,
                        "Mel-Postnet Loss": post_l}, None)


class SemiEpisode(NamedTuple):
    sup_episode: Episode          # labeled FSCL episode
    unsup: ContiAEBatch           # unlabeled speech stream


@SYSTEMS.register("semi-fscl", "semi-fscl-tune")
class SemiTransEmbSystem(TransEmbSystem):
    """Supervised episode loss + unsupervised reconstruction
    (SemiTransEmb.py, deprecated in the reference but kept for parity)."""

    def __init__(self, *args, unsup_weight: float = 1.0, layer_idx: int = 0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.unsup_weight = unsup_weight
        self.layer_idx = layer_idx
        self.unsup_embed = nn.Dense(
            self.model_cfg.transformer.encoder_hidden)

    def init_variables(self, rng, episode: SemiEpisode) -> Dict[str, Any]:
        variables = super().init_variables(rng, episode.sup_episode)
        from fscl_tpu.systems.base import jit_frozen_extract
        hidden, _ = jit_frozen_extract(
            self.extract_ssl, self.upstream_params,
            jnp.asarray(episode.unsup.wavs),
            jnp.asarray(episode.unsup.wav_lens))
        emb_vars = self.unsup_embed.init(
            jax.random.fold_in(rng, 3), hidden[:, :, self.layer_idx])
        variables["params"]["unsup_embed"] = emb_vars["params"]
        return variables

    def loss_and_metrics(self, params, batch_stats, episode: SemiEpisode,
                         rng, train, frozen=None):
        sup_total, (metrics, new_bs) = super().loss_and_metrics(
            params, batch_stats, episode.sup_episode, rng, train, frozen)

        unsup = episode.unsup
        hidden, _ = self.extract_ssl(
            unsup.wavs, unsup.wav_lens,
            frozen.get("upstream") if frozen else None)
        x = self.unsup_embed.apply(
            {"params": params["unsup_embed"]}, hidden[:, :, self.layer_idx])
        from fscl_tpu.systems.conti_ae import interpolate_frames
        x = interpolate_frames(x, unsup.mels.shape[1])
        mel_valid = length_mask(unsup.mel_lens, unsup.mels.shape[1])
        model_vars = {"params": params["model"]}
        if batch_stats is not None:
            model_vars["batch_stats"] = batch_stats["model"]
        mel, postnet_mel = self.model.apply(
            model_vars, x, mel_valid, True, method=FastSpeech2.decode)
        unsup_l = (masked_mean(jnp.abs(mel - unsup.mels), mel_valid)
                   + masked_mean(jnp.abs(postnet_mel - unsup.mels), mel_valid))

        total = sup_total + self.unsup_weight * unsup_l
        metrics = dict(metrics)
        metrics["Unsup Loss"] = unsup_l
        metrics["Total Loss"] = total
        return total, (metrics, new_bs)
