"""FSCL meta-system ("fscl-orig" / TransEmb): per-episode phoneme-embedding
generation from SSL features of the support set.

Re-design of lightning/systems/language/TransEmbOrig.py:20-376 as ONE jitted
function per episode (SURVEY §7.1 "meta-episode = one jitted function"):

    frozen SSL upstream -> phoneme_query_extract (segment ops)
    -> SoftMultiAttCodebook2 -> embedding table (PAD zeroed, NaN guarded)
    -> lookup query texts -> FastSpeech2 (average_spk_emb=True) -> loss.

The upstream's params live in a separate frozen pytree (never optimized,
never checkpointed — parity with the reference's on_save_checkpoint
stripping, TransEmbOrig.py:156-166).

The tune flow ("fscl-orig-tune", tune/FastSpeech2Tune.py:27-111) is the
"embedding transplant": generate the table from the whole few-shot split and
functionally write it into a BaselineSystem's MultilingualEmbedding params.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fscl_tpu.core.config import ModelConfig, OptimConfig
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.core.stats import DEFAULT_STATS, GlobalStats
from fscl_tpu.data.batch import Batch, SupInfo
from fscl_tpu.models.fastspeech2 import FastSpeech2
from fscl_tpu.models.hubert import SSLUpstream, make_upstream
from fscl_tpu.nn.embeddings import SoftMultiAttCodebook2
from fscl_tpu.nn.losses import fastspeech2_loss
from fscl_tpu.ops.masking import length_mask
from fscl_tpu.ops.segment_ops import phoneme_query_extract
from fscl_tpu.systems.base import System


class Episode(NamedTuple):
    """One meta-episode: support raw speech + query TTS batch
    (FSCLCollate output: (sup_out, qry_out, sup_info)). `sup_batch` is the
    support set's full TTS batch (the reference's sup_out), used by the
    MAML inner loop."""
    sup: SupInfo
    qry: Batch
    sup_batch: Optional[Batch] = None


@SYSTEMS.register("fscl", "fscl-orig")
class TransEmbSystem(System):
    def __init__(
        self,
        model_cfg: ModelConfig,
        optim_cfg: OptimConfig,
        n_symbols: int,
        stats: GlobalStats = DEFAULT_STATS,
        upstream: Optional[SSLUpstream] = None,
    ):
        super().__init__(optim_cfg)
        self.model_cfg = model_cfg
        self.stats = stats
        self.n_symbols = n_symbols
        self.upstream = upstream or make_upstream(model_cfg.upstream.name, model_cfg.upstream)
        self.codebook = SoftMultiAttCodebook2(
            codebook_size=model_cfg.codebook.size,
            dim=model_cfg.transformer.encoder_hidden,
            num_heads=model_cfg.codebook.num_heads,
            upstream_dim=model_cfg.upstream.dim,
            n_layers=model_cfg.upstream.n_layers,
            layer_idx=model_cfg.upstream.layer_idx,
            use_layer_weights=model_cfg.upstream.name != "mel",
        )
        self.model = FastSpeech2(model_cfg, stats)
        self.upstream_params: Optional[Dict[str, Any]] = None  # frozen

    # -- upstream ------------------------------------------------------------
    def init_upstream(self, rng, example_wav) -> None:
        from fscl_tpu.models.hubert import storage_cast
        from fscl_tpu.systems.base import jit_init
        self.upstream_params = storage_cast(
            jit_init(self.upstream)(rng, example_wav),
            self.model_cfg.upstream.compute_dtype)

    def load_upstream(self, variables) -> None:
        """Install (possibly converted) frozen upstream weights, auto-
        matching the layer layout to scan_layers (hubert.adapt_layer_layout)
        and pre-casting to the compute dtype (hubert.storage_cast)."""
        from fscl_tpu.models.hubert import adapt_layer_layout, storage_cast
        self.upstream_params = storage_cast(
            adapt_layer_layout(self.upstream, variables),
            self.model_cfg.upstream.compute_dtype)

    def extract_ssl(self, wavs, wav_lens, upstream_params=None):
        """Frozen SSL forward; gradients stopped (reference: torch.no_grad
        at TransEmbOrig.py:60). Pass `upstream_params` (from
        TrainState.frozen) inside jitted steps so the weights stay a
        runtime argument; the host-side fallback closes over
        self.upstream_params. `self.upstream_forward` (set by
        parallel.pipeline.attach_parallel_upstream) swaps in a pipeline-
        or sequence-parallel schedule."""
        from fscl_tpu.models.hubert import frozen_upstream_features
        if upstream_params is None:
            upstream_params = self.upstream_params
        assert upstream_params is not None, "init_upstream first"
        valid = length_mask(wav_lens, wavs.shape[-1])
        fwd = getattr(self, "upstream_forward", None) \
            or frozen_upstream_features
        return fwd(self.upstream, upstream_params, wavs, valid,
                   self.model_cfg.upstream.compute_dtype)

    # -- episode embedding table ----------------------------------------------
    def build_embedding_table(self, params, ssl_hidden, sup: SupInfo,
                              need_weights: bool = False):
        """(TransEmbOrig.build_embedding_table, TransEmbOrig.py:54-84)."""
        table_pre = phoneme_query_extract(
            ssl_hidden, sup.avg_frames, sup.phonemes, self.n_symbols
        )  # (1, n_symbols, n_layers, dim)
        table, attn = self.codebook.apply(
            {"params": params["codebook"]}, table_pre, need_weights)
        table = table[0]                                  # (n_symbols, d)
        table = table.at[0].set(0.0)                      # PAD <- 0
        table = jnp.nan_to_num(table)                     # NaN guard
        return (table, attn) if need_weights else table

    # -- init ------------------------------------------------------------------
    def init_variables(self, rng, episode: Episode) -> Dict[str, Any]:
        r1, r2, r3 = jax.random.split(rng, 3)
        if self.upstream_params is None:
            self.init_upstream(r1, jnp.asarray(episode.sup.wavs))
        d = self.model_cfg.transformer.encoder_hidden
        dummy_query = jnp.zeros(
            (1, self.n_symbols, self.model_cfg.upstream.n_layers,
             self.model_cfg.upstream.dim))
        from fscl_tpu.systems.base import jit_init
        cb_vars = jit_init(self.codebook)(r2, dummy_query)
        qry = episode.qry
        emb = jnp.zeros(qry.texts.shape + (d,))
        model_vars = jit_init(self.model, static_argnums=(3,))(
            r3, emb, jnp.asarray(qry.src_lens), qry.mels.shape[1],
            speaker_args=jax.tree.map(jnp.asarray, qry.speaker_args),
            mel_lens=jnp.asarray(qry.mel_lens),
            p_targets=jnp.asarray(qry.pitches),
            e_targets=jnp.asarray(qry.energies),
            d_targets=jnp.asarray(qry.durations),
            lang_args=jnp.asarray(qry.lang_ids),
        )
        variables = {"params": {"codebook": cb_vars["params"],
                                "model": model_vars["params"]},
                     "frozen": {"upstream": self.upstream_params}}
        if "batch_stats" in model_vars:
            variables["batch_stats"] = {"model": model_vars["batch_stats"]}
        return variables

    # -- episode forward --------------------------------------------------------
    def common_step(self, params, batch_stats, episode: Episode, rng, train,
                    frozen=None):
        """(TransEmbOrig.common_step, TransEmbOrig.py:93-126)."""
        sup, qry = episode.sup, episode.qry
        ssl_hidden, _ = self.extract_ssl(
            sup.wavs, sup.wav_lens,
            frozen.get("upstream") if frozen else None)
        table = self.build_embedding_table(params, ssl_hidden, sup)
        emb_texts = jnp.take(table, qry.texts, axis=0)
        emb_texts = jnp.where((qry.texts == 0)[..., None], 0.0, emb_texts)

        model_vars = {"params": params["model"]}
        mutable = []
        if batch_stats is not None:
            model_vars["batch_stats"] = batch_stats["model"]
            mutable = ["batch_stats"] if train else []
        rngs = {"dropout": rng} if train and rng is not None else None
        out = self.model.apply(
            model_vars, emb_texts, qry.src_lens, qry.mels.shape[1],
            speaker_args=qry.speaker_args, mel_lens=qry.mel_lens,
            p_targets=qry.pitches, e_targets=qry.energies,
            d_targets=qry.durations, lang_args=qry.lang_ids,
            average_spk_emb=True,           # TransEmbOrig.py:113
            deterministic=not train, rngs=rngs, mutable=mutable if mutable else False,
        )
        new_bs = None
        if mutable:
            out, updates = out
            new_bs = {"model": updates["batch_stats"]}
        return out, new_bs

    def loss_and_metrics(self, params, batch_stats, episode: Episode, rng,
                         train, frozen=None):
        out, new_bs = self.common_step(params, batch_stats, episode, rng,
                                       train, frozen)
        qry = episode.qry
        losses = fastspeech2_loss(
            out.mel, out.postnet_mel, out.pitch_prediction,
            out.energy_prediction, out.log_duration_prediction,
            qry.mels, qry.pitches, qry.energies, qry.durations,
            out.src_valid, out.mel_valid,
            self.model_cfg.variance.pitch_feature,
            self.model_cfg.variance.energy_feature,
        )
        return losses.total, (losses.as_dict(), new_bs)


def transplant_embedding(
    baseline_params: Dict[str, Any],
    table: jnp.ndarray,
    symbol_id: str,
) -> Dict[str, Any]:
    """Embedding transplant (tune/FastSpeech2Tune.py:71): copy a generated
    table into a BaselineSystem's MultilingualEmbedding — as a pure pytree
    update."""
    emb = dict(baseline_params["embedding"])
    key = f"table-{symbol_id}"
    assert key in emb, f"no table for symbol_id {symbol_id}"
    assert emb[key].shape == table.shape, (emb[key].shape, table.shape)
    emb[key] = table
    out = dict(baseline_params)
    out["embedding"] = emb
    return out
