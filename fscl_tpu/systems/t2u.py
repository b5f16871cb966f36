"""Text-to-unit (T2U) systems.

Re-designs of lightning/systems/t2u/:
- TacoT2USystem (TacoT2U.py): supervised text->unit Tacotron2.
- TransEmbT2USystem (TransEmb.py:22-217): FSCL applied to T2U — embedding
  table generated per episode by Downstream1 + two-stage phoneme query
  extraction; framewise CE + accuracy; teacher-forcing schedule
  (schedule_f, TransEmb.py:213 — constant 1.0 with optional linear decay).
- E2E chain (TransEmbE2ETune.py:169-193): t2u logits -> softmax @ frozen
  u2s unit-embedding table -> u2s FastSpeech2 -> joint T2U + U2S loss.
- DA module (modules.py:10-39): gradient-reversal discriminator over unit
  distributions.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import ModelConfig, OptimConfig
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.core.stats import DEFAULT_STATS, GlobalStats
from fscl_tpu.data.batch import Batch, SupInfo
from fscl_tpu.models.hubert import SSLUpstream, make_upstream
from fscl_tpu.models.tacotron2_t2u import T2UConfig, TacoT2U
from fscl_tpu.nn.downstreams import Downstream1
from fscl_tpu.nn.embeddings import MultilingualEmbedding
from fscl_tpu.nn.losses import framewise_accuracy, framewise_ce_loss
from fscl_tpu.ops.masking import length_mask
from fscl_tpu.ops.segment_ops import phoneme_query_extract
from fscl_tpu.systems.base import System


def schedule_f(step) -> float:
    """Teacher-forcing schedule (TransEmb.py:213-217): constant 1.0; the
    commented linear decay in the reference is available via
    `linear_decay_schedule`."""
    return 1.0


def linear_decay_schedule(step, floor: float = 0.5, span: float = 20000.0):
    return jnp.maximum(floor, 1.0 - step / span)


class T2UBatch(NamedTuple):
    speaker_args: np.ndarray   # (B,)
    texts: np.ndarray          # (B, L) phoneme ids
    src_lens: np.ndarray       # (B,)
    units: np.ndarray          # (B, T_u) unit ids, <eos>=8 appended
    unit_lens: np.ndarray      # (B,)
    lang_ids: np.ndarray       # (B,)


class T2UEpisode(NamedTuple):
    sup: SupInfo
    qry: T2UBatch


@SYSTEMS.register("tacot2u")
class TacoT2USystem(System):
    """Supervised text->unit (TacoT2U.py)."""

    def __init__(self, model_cfg: ModelConfig, optim_cfg: OptimConfig,
                 id2symbols: Tuple[Tuple[str, int], ...], t2u_cfg: T2UConfig):
        super().__init__(optim_cfg)
        self.model_cfg = model_cfg
        self.t2u_cfg = t2u_cfg
        self.embedding_model = MultilingualEmbedding(
            id2symbols, t2u_cfg.symbols_embedding_dim)
        self.model = TacoT2U(t2u_cfg)

    def init_variables(self, rng, batch: T2UBatch) -> Dict[str, Any]:
        r1, r2, r3 = jax.random.split(rng, 3)
        from fscl_tpu.systems.base import jit_init
        emb_vars = jit_init(self.embedding_model)(r1, jnp.asarray(batch.texts))
        emb = self.embedding_model.apply(emb_vars, jnp.asarray(batch.texts))
        model_vars = jit_init(self.model)(
            r2, emb, jnp.asarray(batch.src_lens), jnp.asarray(batch.units), r3)
        variables = {"params": {"embedding": emb_vars["params"],
                                "model": model_vars["params"]}}
        if "batch_stats" in model_vars:
            variables["batch_stats"] = {"model": model_vars["batch_stats"]}
        return variables

    def forward(self, params, batch_stats, batch: T2UBatch, rng, train,
                tf_ratio=1.0):
        emb = self.embedding_model.apply(
            {"params": params["embedding"]}, batch.texts)
        model_vars = {"params": params["model"]}
        mutable = []
        if batch_stats is not None:
            model_vars["batch_stats"] = batch_stats["model"]
            mutable = ["batch_stats"] if train else []
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_scan, r_drop = jax.random.split(rng)
        out = self.model.apply(
            model_vars, emb, batch.src_lens, batch.units, r_scan,
            teacher_forcing_ratio=tf_ratio, deterministic=not train,
            rngs={"dropout": r_drop} if train else None,
            mutable=mutable if mutable else False)
        new_bs = None
        if mutable:
            (logits, aligns), updates = out
            new_bs = {"model": updates["batch_stats"]}
        else:
            logits, aligns = out
        return logits, aligns, new_bs

    def loss_and_metrics(self, params, batch_stats, batch: T2UBatch, rng,
                         train, frozen=None):
        logits, _, new_bs = self.forward(params, batch_stats, batch, rng, train)
        loss = framewise_ce_loss(logits, batch.units)
        acc = framewise_accuracy(logits, batch.units)
        return loss, ({"Total Loss": loss, "Acc": acc}, new_bs)


@SYSTEMS.register("fscl-t2u", "fscl-t2u-orig")
class TransEmbT2USystem(System):
    """FSCL T2U meta-system (t2u/TransEmb.py:22-217)."""

    def __init__(self, model_cfg: ModelConfig, optim_cfg: OptimConfig,
                 n_symbols: int, t2u_cfg: T2UConfig,
                 upstream: Optional[SSLUpstream] = None):
        super().__init__(optim_cfg)
        self.model_cfg = model_cfg
        self.t2u_cfg = t2u_cfg
        self.n_symbols = n_symbols
        self.upstream = upstream or make_upstream(model_cfg.upstream.name, model_cfg.upstream)
        self.embedding_generator = Downstream1(
            n_in_layers=model_cfg.upstream.n_layers,
            d_model=t2u_cfg.symbols_embedding_dim,
            specific_layer=model_cfg.upstream.layer_idx,
        )
        self.model = TacoT2U(t2u_cfg)
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

    def frame_features(self, params, ssl_hidden, frame_valid):
        """Frame-level features the phoneme queries are averaged from —
        the variant axis across TransEmb/C/C2 (t2u/TransEmb.py vs
        TransEmbC.py vs TransEmbC2.py). Base: Downstream1."""
        return self.embedding_generator.apply(
            {"params": params["embedding_generator"]}, ssl_hidden,
            frame_valid, True)

    def post_table(self, params, table_pre):
        """Transform applied AFTER phoneme-query extraction (codebook
        attention for the C2 variant; identity here)."""
        return table_pre

    def build_embedding_table(self, params, ssl_hidden, sup: SupInfo,
                              train: bool = False, rng=None):
        """(t2u/TransEmb.py:54-73): frame features, two-stage phoneme query
        extraction, then the variant's post-extraction transform."""
        Tp = ssl_hidden.shape[1]
        frame_lens = jnp.sum(sup.avg_frames, axis=-1)
        frame_valid = length_mask(jnp.minimum(frame_lens, Tp), Tp)
        x = self.frame_features(params, ssl_hidden, frame_valid)
        x = x[:, :, None, :]   # (B, T, 1, d) for segment extraction
        table_pre = phoneme_query_extract(
            x, sup.avg_frames, sup.phonemes, sup.n_symbols)[0, :, 0]
        return self.post_table(params, table_pre)    # (n_symbols, d)

    def init_variables(self, rng, episode: T2UEpisode) -> Dict[str, Any]:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        sup, qry = episode
        if self.upstream_params is None:
            self.init_upstream(r1, jnp.asarray(sup.wavs))
        dummy = jnp.zeros(
            (1, 8, self.model_cfg.upstream.n_layers, self.model_cfg.upstream.dim))
        from fscl_tpu.systems.base import jit_init
        gen_vars = jit_init(self.embedding_generator)(r2, dummy)
        emb = jnp.zeros(qry.texts.shape + (self.t2u_cfg.symbols_embedding_dim,))
        model_vars = jit_init(self.model)(
            r3, emb, jnp.asarray(qry.src_lens), jnp.asarray(qry.units), r4)
        variables = {"params": {
            "embedding_generator": gen_vars["params"],
            "model": model_vars["params"]},
            "frozen": {"upstream": self.upstream_params}}
        if "batch_stats" in model_vars:
            variables["batch_stats"] = {"model": model_vars["batch_stats"]}
        return variables

    def common_step(self, params, batch_stats, episode: T2UEpisode, rng,
                    train, step=0, frozen=None):
        sup, qry = episode
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
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_scan, r_drop = jax.random.split(rng)
        out = self.model.apply(
            model_vars, emb_texts, qry.src_lens, qry.units, r_scan,
            teacher_forcing_ratio=schedule_f(step),
            deterministic=not train,
            rngs={"dropout": r_drop} if train else None,
            mutable=mutable if mutable else False)
        new_bs = None
        if mutable:
            (logits, aligns), updates = out
            new_bs = {"model": updates["batch_stats"]}
        else:
            logits, aligns = out
        return logits, aligns, new_bs

    def loss_and_metrics(self, params, batch_stats, episode: T2UEpisode,
                         rng, train, frozen=None):
        logits, _, new_bs = self.common_step(
            params, batch_stats, episode, rng, train, frozen=frozen)
        loss = framewise_ce_loss(logits, episode.qry.units)
        acc = framewise_accuracy(logits, episode.qry.units)
        return loss, ({"Total Loss": loss, "Acc": acc}, new_bs)


@SYSTEMS.register("fscl-t2u-c", "fscl-t2u-codebook")
class TransEmbCT2USystem(TransEmbT2USystem):
    """TransEmbC (t2u/TransEmbC.py:25-90): embedding generator is
    Downstream2 (codeformer last layer) instead of Downstream1."""

    def __init__(self, model_cfg, optim_cfg, n_symbols, t2u_cfg,
                 upstream=None):
        super().__init__(model_cfg, optim_cfg, n_symbols, t2u_cfg, upstream)
        from fscl_tpu.nn.downstreams import Downstream2
        self.embedding_generator = Downstream2(
            n_in_layers=model_cfg.upstream.n_layers,
            codebook_size=model_cfg.codebook.size,
            d_model=t2u_cfg.symbols_embedding_dim,
            specific_layer=model_cfg.upstream.layer_idx,
        )

    def frame_features(self, params, ssl_hidden, frame_valid):
        x, _ = self.embedding_generator.apply(
            {"params": params["embedding_generator"]}, ssl_hidden,
            frame_valid, True)
        return x


@SYSTEMS.register("fscl-t2u-c2", "fscl-t2u-codebook2")
class TransEmbC2T2USystem(TransEmbT2USystem):
    """TransEmbC2 (t2u/TransEmbC2.py:25-80): Downstream1 features, then a
    codebook attention over the extracted phoneme queries."""

    def __init__(self, model_cfg, optim_cfg, n_symbols, t2u_cfg,
                 upstream=None):
        super().__init__(model_cfg, optim_cfg, n_symbols, t2u_cfg, upstream)
        from fscl_tpu.nn.embeddings import SoftMultiAttCodebook
        self.codebook_attention = SoftMultiAttCodebook(
            codebook_size=model_cfg.codebook.size,
            dim=t2u_cfg.symbols_embedding_dim,
            num_heads=model_cfg.codebook.num_heads,
        )

    def init_variables(self, rng, episode: "T2UEpisode"):
        variables = super().init_variables(rng, episode)
        dummy = jnp.zeros(
            (1, episode.sup.n_symbols, self.t2u_cfg.symbols_embedding_dim))
        cb_vars = self.codebook_attention.init(
            jax.random.fold_in(rng, 5), dummy)
        variables["params"]["codebook_attention"] = cb_vars["params"]
        return variables

    def post_table(self, params, table_pre):
        table, _ = self.codebook_attention.apply(
            {"params": params["codebook_attention"]}, table_pre[None])
        return table[0]


class GradientReversal(nn.Module):
    """Gradient reversal layer (t2u/modules.py:10-20 equivalent)."""
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        @jax.custom_vjp
        def rev(y):
            return y

        def fwd(y):
            return y, None

        def bwd(_, g):
            return (-self.scale * g,)

        rev.defvjp(fwd, bwd)
        return rev(x)


class UnitDiscriminator(nn.Module):
    """wav2vec2-U-style discriminator over (soft) one-hot unit distributions
    (t2u/modules.py:22-39): conv stack -> scalar logit per sequence."""
    n_units: int
    hidden: int = 256
    n_layers: int = 3
    kernel: int = 6

    @nn.compact
    def __call__(self, unit_probs, valid=None):
        x = unit_probs
        for i in range(self.n_layers - 1):
            x = nn.Conv(self.hidden, (self.kernel,), padding="SAME",
                        name=f"conv_{i}")(x)
            x = nn.gelu(x)
        x = nn.Conv(1, (self.kernel,), padding="SAME", name="conv_out")(x)[..., 0]
        if valid is not None:
            x = jnp.where(valid, x, 0.0)
            return jnp.sum(x, axis=-1) / jnp.maximum(
                jnp.sum(valid, axis=-1), 1)
        return jnp.mean(x, axis=-1)


class DA(nn.Module):
    """Domain-adversarial module: gradient reversal + discriminator."""
    n_units: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, unit_probs, valid=None):
        x = GradientReversal(self.scale, name="grl")(unit_probs)
        return UnitDiscriminator(self.n_units, name="discriminator")(x, valid)
