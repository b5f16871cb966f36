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
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import ModelConfig, OptimConfig
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.data.batch import SupInfo
from fscl_tpu.models.hubert import SSLUpstream, make_upstream
from fscl_tpu.nn.downstreams import (
    BiLSTMDownstream, Downstream1, LinearDownstream, MultilingualClusterHead,
    MultilingualPRHead,
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
        from fscl_tpu.models.hubert import storage_cast
        from fscl_tpu.systems.base import jit_init
        self.upstream_params = storage_cast(
            jit_init(self.upstream)(rng, example_wav),
            self.model_cfg.upstream.compute_dtype)

    def extract_ssl(self, wavs, wav_lens, upstream_params=None):
        from fscl_tpu.models.hubert import frozen_upstream_features
        if upstream_params is None:
            upstream_params = self.upstream_params
        assert upstream_params is not None
        valid = length_mask(wav_lens, wavs.shape[-1])
        fwd = getattr(self, "upstream_forward", None) \
            or frozen_upstream_features
        return fwd(self.upstream, upstream_params, wavs, valid,
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
        from fscl_tpu.systems.base import jit_frozen_extract
        hidden, _ = jit_frozen_extract(
            self.extract_ssl, self.upstream_params,
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


@SYSTEMS.register("pr-ssl-baseline", "pr-ssl-baseline-tune")
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
        from fscl_tpu.systems.base import jit_frozen_extract
        hidden, frame_valid = jit_frozen_extract(
            self.extract_ssl, self.upstream_params,
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


class TransHeadGenerator(nn.Module):
    """Head-weight generator (TransHead.py:26-31): learned weighted sum
    over the SSL layer axis of the phoneme queries, then single-head soft
    codebook attention (att_banks -> emb_banks) producing one classifier
    row per symbol."""
    n_in_layers: int
    codebook_size: int
    dim: int
    upstream_dim: int
    specific_layer: Optional[int] = None

    @nn.compact
    def __call__(self, queries, need_weights: bool = False):
        from fscl_tpu.nn.downstreams import WeightedSumLayer
        from fscl_tpu.nn.phoneme_embedding import SoftAttCodebook
        # queries: (1, n_symbols, n_layers, upstream_dim)
        x = WeightedSumLayer(self.n_in_layers, self.specific_layer,
                             name="weighted_sum")(queries, axis=2)
        table, attn = SoftAttCodebook(
            self.codebook_size, self.dim, self.upstream_dim,
            name="codebook")(x[0], need_weights)
        return table, attn


@SYSTEMS.register("pr-trans-head", "pr-trans-head-tune",
                  "pr-fscl", "pr-fscl-tune")
class TransHeadPRSystem(_SSLPRBase):
    """TransHead (TransHead.py:23-165): episodic PR whose classification
    head is GENERATED per episode — raw SSL phoneme queries from the
    support set (single-stage average, PhonemeQueryExtractor(mode=
    "average")) through codebook attention give the head weight matrix;
    query frames run through a BiLSTM downstream and are classified by
    x @ head_weights^T + bias (F.linear, TransHead.py:90-92)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        d = self.model_cfg.transformer.encoder_hidden
        up = self.model_cfg.upstream
        self.downstream = BiLSTMDownstream(
            n_in_layers=up.n_layers, d_out=d,
            specific_layer=up.layer_idx)
        self.head_generator = TransHeadGenerator(
            n_in_layers=up.n_layers,
            codebook_size=self.model_cfg.codebook.size,
            dim=d, upstream_dim=up.dim,
            specific_layer=up.layer_idx)

    def init_variables(self, rng, episode: PREpisode) -> Dict[str, Any]:
        r1, r2, r3 = jax.random.split(rng, 3)
        if self.upstream_params is None:
            self.init_upstream(r1, jnp.asarray(episode.sup.wavs))
        from fscl_tpu.systems.base import jit_frozen_extract
        hidden, frame_valid = jit_frozen_extract(
            self.extract_ssl, self.upstream_params,
            jnp.asarray(episode.sup.wavs),
            jnp.asarray(episode.sup.wav_lens))
        ds_vars = self.downstream.init(r2, hidden, frame_valid)
        queries = frame_phoneme_query_extract(
            hidden, jnp.asarray(episode.sup.avg_frames),
            jnp.asarray(episode.sup.phonemes), episode.sup.n_symbols)
        gen_vars = self.head_generator.init(r3, queries)
        return {"params": {"downstream": ds_vars["params"],
                           "head_generator": gen_vars["params"],
                           "trans_head_bias": jnp.zeros((1,))},
                "frozen": {"upstream": self.upstream_params}}

    def support_frame_queries(self, sup: PRBatch, upstream_params=None):
        """Raw-SSL single-stage phoneme queries for a support batch:
        (1, n_symbols, n_layers, dim) frame means (no downstream). Exposed
        separately so offline evaluation can stream many support batches
        (frame-count-weighted accumulation) before generating the head."""
        hidden, _ = self.extract_ssl(sup.wavs, sup.wav_lens, upstream_params)
        return frame_phoneme_query_extract(
            hidden, sup.avg_frames, sup.phonemes, sup.n_symbols)

    def head_from_queries(self, params, queries, need_weights: bool = False):
        return self.head_generator.apply(
            {"params": params["head_generator"]}, queries, need_weights)

    def build_head_weights(self, params, sup: PRBatch, upstream_params=None,
                           need_weights: bool = False):
        """(TransHead.build_head_weights, TransHead.py:53-64): raw SSL
        reprs (no downstream) -> single-stage phoneme queries -> codebook."""
        queries = self.support_frame_queries(sup, upstream_params)
        return self.head_from_queries(params, queries, need_weights)

    def logits(self, params, episode: PREpisode, upstream_params=None):
        head_weights, _ = self.build_head_weights(
            params, episode.sup, upstream_params)
        hidden, frame_valid = self.extract_ssl(
            episode.qry.wavs, episode.qry.wav_lens, upstream_params)
        x = self.downstream.apply(
            {"params": params["downstream"]}, hidden, frame_valid)
        return (jnp.einsum("btd,sd->bts", x, head_weights,
                           preferred_element_type=jnp.float32)
                + params["trans_head_bias"][0])

    def loss_and_metrics(self, params, batch_stats, episode: PREpisode,
                         rng, train, frozen=None):
        logits = self.logits(params, episode,
                             frozen.get("upstream") if frozen else None)
        labels = self.frame_labels(episode.qry, logits.shape[1])
        loss = framewise_ce_loss(logits, labels)
        acc = framewise_accuracy(logits, labels)
        return loss, ({"Total Loss": loss, "Acc": acc}, None)


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
        from fscl_tpu.systems.base import jit_frozen_extract
        hidden, frame_valid = jit_frozen_extract(
            self.extract_ssl, self.upstream_params,
            jnp.asarray(episode.sup.wavs),
            jnp.asarray(episode.sup.wav_lens))
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
