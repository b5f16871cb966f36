"""ADA systems: AdaSpeech2-style untranscribed-speech adaptation.

Re-design of lightning/systems/language/TransEmbADA.py:30-243 and
lightning/model/ada_encoder.py:11-25:
- ADAEncoder: mel -> linear embed -> FFT encoder stack, producing features in
  the decoder-input space.
- Stage "matching": train the ADA encoder so its output matches the TTS
  model's decoder input (MSE on valid frames) + mel reconstruction through
  the frozen decoder.
- Stage "unsup_tuning": freeze everything except the norm layers of
  decoder/postnet; train on the ADA reconstruction loss only.

No forward hooks needed: FastSpeech2Output carries `decoder_input`, and
`FastSpeech2.decode` is a standalone method.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fscl_tpu.core.config import ModelConfig, OptimConfig
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.data.batch import Batch
from fscl_tpu.models.fastspeech2 import FastSpeech2
from fscl_tpu.nn.fft_block import Encoder
from fscl_tpu.ops.masking import length_mask, masked_mean
from fscl_tpu.systems.fscl import Episode, TransEmbSystem


class ADAEncoder(nn.Module):
    """Mel encoder (ada_encoder.py:11-25): linear embed + Encoder2 stack."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, mels, mel_valid, deterministic: bool = True):
        t = self.cfg.transformer
        x = nn.Dense(t.encoder_hidden, name="embed")(mels)
        return Encoder(
            t.encoder_layer, t.encoder_hidden, t.encoder_head,
            t.conv_filter_size, t.conv_kernel_size, t.encoder_dropout,
            self.cfg.max_seq_len, name="encoder",
        )(x, mel_valid, deterministic)


def _is_norm_path(path: Tuple[str, ...]) -> bool:
    joined = "/".join(str(p) for p in path)
    return ("layer_norm" in joined) or ("/bn_" in joined) or \
        joined.endswith("layer_norm") or any(
            str(p).startswith("bn_") for p in path)


def norm_only_mask(params) -> Any:
    """Trainable mask selecting only norm layers under model/decoder and
    model/postnet (freeze_non_norm_layer, TransEmbADA.py:53-56)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        in_scope = any(k in ("decoder", "postnet") for k in keys)
        return in_scope and _is_norm_path(keys)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: decide(path), params)


@SYSTEMS.register("fscl-ada", "fscl-ada1", "fscl-ada2")
class TransEmbADASystem(TransEmbSystem):
    """FSCL + ADA plug-in (ada_class_factory, TransEmbADA.py:30-130)."""

    def __init__(self, *args, ada_stage: str = "matching", **kwargs):
        assert ada_stage in ("matching", "unsup_tuning")
        super().__init__(*args, **kwargs)
        self.ada_stage = ada_stage
        self.ada_encoder = ADAEncoder(self.model_cfg)

    def _ada_input(self, episode: "Episode", frozen=None):
        """What the ADA encoder consumes: target mels (mel variant)."""
        qry = episode.qry
        return qry.mels, length_mask(qry.mel_lens, qry.mels.shape[1])

    def init_variables(self, rng, episode: Episode) -> Dict[str, Any]:
        variables = super().init_variables(rng, episode)
        ada_in, ada_valid = self._ada_input(episode)
        ada_vars = self.ada_encoder.init(
            jax.random.fold_in(rng, 7), jnp.asarray(ada_in), ada_valid)
        variables["params"]["ada"] = ada_vars["params"]
        return variables

    def trainable_mask(self, params):
        if self.ada_stage == "matching":
            # only the ADA encoder trains
            return jax.tree_util.tree_map_with_path(
                lambda path, _: getattr(path[0], "key", None) == "ada",
                params)
        # unsup_tuning: norm layers of decoder/postnet only
        return jax.tree_util.tree_map_with_path(
            lambda path, _: (
                getattr(path[0], "key", None) == "model"
                and _is_norm_path(
                    tuple(getattr(k, "key", str(k)) for k in path))
                and any(getattr(k, "key", None) in ("decoder", "postnet")
                        for k in path)),
            params)

    def common_ada_step(self, params, batch_stats, episode: Episode, rng,
                        train, frozen=None):
        """(TransEmbADA.common_ada_step, TransEmbADA.py:76-96)."""
        qry = episode.qry
        mel_valid = length_mask(qry.mel_lens, qry.mels.shape[1])

        # reference pass for the decoder input (no grad, like torch.no_grad)
        out, _ = self.common_step(params, batch_stats, episode, rng, False,
                                  frozen)
        hooked = jax.lax.stop_gradient(out.decoder_input)

        rngs = ({"dropout": jax.random.fold_in(rng, 1)}
                if train and rng is not None else None)
        ada_in, ada_valid = self._ada_input(episode, frozen)
        feat = self.ada_encoder.apply(
            {"params": params["ada"]}, ada_in, ada_valid,
            not (train and rng is not None), rngs=rngs)
        match_loss = masked_mean((feat - hooked) ** 2, out.mel_valid)

        # reconstruction through the decoder
        model_vars = {"params": params["model"]}
        if batch_stats is not None:
            model_vars["batch_stats"] = batch_stats["model"]
        mel, postnet_mel = self.model.apply(
            model_vars, feat, mel_valid, True, method=FastSpeech2.decode)
        mel_l = masked_mean(jnp.abs(mel - qry.mels), mel_valid)
        post_l = masked_mean(jnp.abs(postnet_mel - qry.mels), mel_valid)
        recon = mel_l + post_l
        return {
            "Match Loss": match_loss, "Recon Loss": recon,
            "Mel Loss": mel_l, "Mel-Postnet Loss": post_l,
        }

    def loss_and_metrics(self, params, batch_stats, episode: Episode, rng,
                         train, frozen=None):
        metrics = self.common_ada_step(params, batch_stats, episode, rng,
                                       train, frozen)
        return self._total_from_metrics(metrics)

    def _total_from_metrics(self, metrics):
        if self.ada_stage == "matching":
            total = metrics["Recon Loss"] + metrics["Match Loss"]
        else:
            total = metrics["Recon Loss"]
        metrics["Total Loss"] = total
        return total, (metrics, None)


class SSLEpisode(NamedTuple):
    """FSCL episode + raw query speech for the SSL-ADA variant
    (ssl_ada_class_factory's qry_info, TransEmbADA.py:130-170)."""
    sup: Any
    qry: Any
    qry_wavs: Any = None       # (B, T_wav) 16 kHz
    qry_wav_lens: Any = None
    sup_batch: Any = None


@SYSTEMS.register("fscl-ssl_ada", "fscl-ssl_ada1", "fscl-ssl_ada2")
class TransEmbSSLADASystem(TransEmbADASystem):
    """ADA encoder consumes SSL features of the untranscribed query speech
    (interpolated to mel length) instead of mels."""

    def __init__(self, *args, ssl_layer_idx: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.ssl_layer_idx = ssl_layer_idx

    def _ada_input(self, episode, frozen=None):
        from fscl_tpu.systems.conti_ae import interpolate_frames
        qry = episode.qry
        hidden, _ = self.extract_ssl(
            jnp.asarray(episode.qry_wavs), jnp.asarray(episode.qry_wav_lens),
            frozen.get("upstream") if frozen else None)
        feat = hidden[:, :, self.ssl_layer_idx]
        feat = interpolate_frames(feat, qry.mels.shape[1])
        return feat, length_mask(qry.mel_lens, qry.mels.shape[1])
