"""Phoneme-recognition (PR) systems.

Re-designs of lightning/systems/phoneme_recognition/ (9 files, §2.6):
- SSLLinearSystem ("pr-ssl-linear"): frozen upstream -> LinearDownstream ->
  per-language linear head, framewise CE ignoring PAD.
- SSLBaselineSystem ("pr-ssl-baseline"): frozen upstream -> Downstream1 ->
  MultilingualPRHead.
- SSLClusterSystem ("pr-ssl-cluster"): cosine/L2 cluster head.
- SSLProtoNetSystem ("pr-ssl-protonet"): per-episode prototypes from the
  support set (frame-level phoneme query extraction over Downstream1
  features, SSLProtoNet.py:63-121), query frames classified by -L2 distance.

The CTC scaffolding present-but-disabled in the reference
(SSLProtoNet.py:25 use_ctc=False) maps to the C++ beam decoder in cpp/
used by the offline eval instead of the training loss.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import ModelConfig, OptimConfig
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.data.batch import SupInfo
from fscl_tpu.models.hubert import SSLUpstream, make_upstream
from fscl_tpu.nn.downstreams import (
    Downstream1, LinearDownstream, MultilingualClusterHead, MultilingualPRHead,
)
from fscl_tpu.nn.losses import framewise_accuracy, framewise_ce_loss
from fscl_tpu.ops.length_regulator import gather_frame_labels
from fscl_tpu.ops.masking import length_mask
from fscl_tpu.ops.segment_ops import frame_phoneme_query_extract
from fscl_tpu.systems.base import System


@flax.struct.dataclass
class PRBatch:
    """`n_symbols` and `symbol_id` are static (compile-time) metadata."""
    wavs: np.ndarray          # (B, T_wav) 16 kHz
    wav_lens: np.ndarray      # (B,)
    avg_frames: np.ndarray    # (B, L) SSL frames per phoneme
    phonemes: np.ndarray      # (B, L) phoneme ids (= labels)
    lang_ids: np.ndarray      # (B,)
    n_symbols: int = flax.struct.field(pytree_node=False, default=0)
    symbol_id: str = flax.struct.field(pytree_node=False, default="en")


class PREpisode(NamedTuple):
    sup: PRBatch
    qry: PRBatch


class _SSLPRBase(System):
    def __init__(self, model_cfg: ModelConfig, optim_cfg: OptimConfig,
                 id2symbols: Tuple[Tuple[str, int], ...],
                 upstream: Optional[SSLUpstream] = None):
        super().__init__(optim_cfg)
        self.model_cfg = model_cfg
        self.id2symbols = id2symbols
        self.upstream = upstream or make_upstream(model_cfg.upstream.name, model_cfg.upstream)
        self.upstream_params: Optional[Dict[str, Any]] = None

    def init_upstream(self, rng, example_wav) -> None:
        self.upstream_params = self.upstream.init(rng, example_wav)

    def extract_ssl(self, wavs, wav_lens, upstream_params=None):
        from fscl_tpu.models.hubert import frozen_upstream_features
        if upstream_params is None:
            upstream_params = self.upstream_params
        assert upstream_params is not None
        valid = length_mask(wav_lens, wavs.shape[-1])
        return frozen_upstream_features(
            self.upstream, upstream_params, wavs, valid,
            self.model_cfg.upstream.compute_dtype)

    def frame_labels(self, batch: PRBatch, n_frames: int):
        return gather_frame_labels(batch.phonemes, batch.avg_frames, n_frames)


@SYSTEMS.register("pr-ssl-linear", "pr-ssl-linear-tune")
class SSLLinearSystem(_SSLPRBase):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.downstream = LinearDownstream(
            n_in_layers=self.model_cfg.upstream.n_layers,
            d_out=self.model_cfg.transformer.encoder_hidden,
            specific_layer=self.model_cfg.upstream.layer_idx)
        self.head = MultilingualPRHead(
            self.id2symbols, self.model_cfg.transformer.encoder_hidden)

    def init_variables(self, rng, batch: PRBatch) -> Dict[str, Any]:
        r1, r2, r3 = jax.random.split(rng, 3)
        if self.upstream_params is None:
            self.init_upstream(r1, jnp.asarray(batch.wavs))
        hidden, _ = self.extract_ssl(
            jnp.asarray(batch.wavs), jnp.asarray(batch.wav_lens))
        ds_vars = self.downstream.init(r2, hidden)
        x = self.downstream.apply(ds_vars, hidden)
        head_vars = self.head.init(r3, x, batch.symbol_id)
        return {"params": {"downstream": ds_vars["params"],
                           "head": head_vars["params"]},
                "frozen": {"upstream": self.upstream_params}}

    def logits(self, params, batch: PRBatch, upstream_params=None):
        hidden, _ = self.extract_ssl(batch.wavs, batch.wav_lens,
                                     upstream_params)
        x = self.downstream.apply({"params": params["downstream"]}, hidden)
        return self.head.apply({"params": params["head"]}, x, batch.symbol_id)

    def loss_and_metrics(self, params, batch_stats, batch: PRBatch, rng,
                         train, frozen=None):
        logits = self.logits(params, batch,
                             frozen.get("upstream") if frozen else None)
        labels = self.frame_labels(batch, logits.shape[1])
        loss = framewise_ce_loss(logits, labels)
        acc = framewise_accuracy(logits, labels)
        return loss, ({"Total Loss": loss, "Acc": acc}, None)


@SYSTEMS.register("pr-ssl-baseline", "pr-ssl-baseline-tune",
                  "pr-trans-head", "pr-trans-head-tune",
                  "pr-fscl", "pr-fscl-tune")
class SSLBaselineSystem(_SSLPRBase):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.downstream = Downstream1(
            n_in_layers=self.model_cfg.upstream.n_layers,
            d_model=self.model_cfg.transformer.encoder_hidden,
            n_head=self.model_cfg.transformer.encoder_head,
            specific_layer=self.model_cfg.upstream.layer_idx)
        self.head = MultilingualPRHead(
            self.id2symbols, self.model_cfg.transformer.encoder_hidden)

    def init_variables(self, rng, batch: PRBatch) -> Dict[str, Any]:
        r1, r2, r3 = jax.random.split(rng, 3)
        if self.upstream_params is None:
            self.init_upstream(r1, jnp.asarray(batch.wavs))
        hidden, frame_valid = self.extract_ssl(
            jnp.asarray(batch.wavs), jnp.asarray(batch.wav_lens))
        ds_vars = self.downstream.init(r2, hidden, frame_valid)
        x = self.downstream.apply(ds_vars, hidden, frame_valid)
        head_vars = self.head.init(r3, x, batch.symbol_id)
        return {"params": {"downstream": ds_vars["params"],
                           "head": head_vars["params"]},
                "frozen": {"upstream": self.upstream_params}}

    def logits(self, params, batch: PRBatch, rng=None, train=False,
               upstream_params=None):
        hidden, frame_valid = self.extract_ssl(batch.wavs, batch.wav_lens,
                                               upstream_params)
        x = self.downstream.apply(
            {"params": params["downstream"]}, hidden, frame_valid,
            not train, rngs={"dropout": rng} if train and rng is not None else None)
        return self.head.apply({"params": params["head"]}, x, batch.symbol_id)

    def loss_and_metrics(self, params, batch_stats, batch: PRBatch, rng,
                         train, frozen=None):
        logits = self.logits(params, batch, rng, train,
                             frozen.get("upstream") if frozen else None)
        labels = self.frame_labels(batch, logits.shape[1])
        loss = framewise_ce_loss(logits, labels)
        acc = framewise_accuracy(logits, labels)
        return loss, ({"Total Loss": loss, "Acc": acc}, None)


@SYSTEMS.register("pr-ssl-cluster", "pr-ssl-cluster-tune")
class SSLClusterSystem(SSLBaselineSystem):
    def __init__(self, *args, cluster_mode: str = "cos", **kwargs):
        super().__init__(*args, **kwargs)
        self.head = MultilingualClusterHead(
            self.id2symbols, self.model_cfg.transformer.encoder_hidden,
            mode=cluster_mode)


@SYSTEMS.register("pr-ssl-protonet")
class SSLProtoNetSystem(_SSLPRBase):
    """Episodic: prototypes from support, -L2 classification of query frames
    (SSLProtoNet.py:63-121)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.downstream = Downstream1(
            n_in_layers=self.model_cfg.upstream.n_layers,
            d_model=self.model_cfg.transformer.encoder_hidden,
            n_head=self.model_cfg.transformer.encoder_head,
            specific_layer=self.model_cfg.upstream.layer_idx)

    def init_variables(self, rng, episode: PREpisode) -> Dict[str, Any]:
        r1, r2 = jax.random.split(rng)
        if self.upstream_params is None:
            self.init_upstream(r1, jnp.asarray(episode.sup.wavs))
        hidden, frame_valid = self.extract_ssl(
            jnp.asarray(episode.sup.wavs), jnp.asarray(episode.sup.wav_lens))
        ds_vars = self.downstream.init(r2, hidden, frame_valid)
        return {"params": {"downstream": ds_vars["params"]},
                "frozen": {"upstream": self.upstream_params}}

    def build_prototypes(self, params, sup: PRBatch, rng=None, train=False,
                         upstream_params=None):
        hidden, frame_valid = self.extract_ssl(sup.wavs, sup.wav_lens,
                                               upstream_params)
        x = self.downstream.apply(
            {"params": params["downstream"]}, hidden, frame_valid,
            not train, rngs={"dropout": rng} if train and rng is not None else None)
        protos = frame_phoneme_query_extract(
            x[:, :, None, :], sup.avg_frames, sup.phonemes, sup.n_symbols)
        return protos[0, :, 0]        # (n_symbols, d)

    def classify(self, params, protos, qry: PRBatch, rng=None, train=False,
                 upstream_params=None):
        hidden, frame_valid = self.extract_ssl(qry.wavs, qry.wav_lens,
                                               upstream_params)
        x = self.downstream.apply(
            {"params": params["downstream"]}, hidden, frame_valid,
            not train, rngs={"dropout": rng} if train and rng is not None else None)
        d = x[:, :, None, :] - protos[None, None, :, :]
        return -jnp.sum(d * d, axis=-1)   # (B, T, n_symbols) -L2^2 logits

    def loss_and_metrics(self, params, batch_stats, episode: PREpisode,
                         rng, train, frozen=None):
        up = frozen.get("upstream") if frozen else None
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        protos = self.build_prototypes(params, episode.sup, r1, train, up)
        logits = self.classify(params, protos, episode.qry, r2, train, up)
        labels = self.frame_labels(episode.qry, logits.shape[1])
        loss = framewise_ce_loss(logits, labels)
        acc = framewise_accuracy(logits, labels)
        return loss, ({"Total Loss": loss, "Acc": acc}, None)
