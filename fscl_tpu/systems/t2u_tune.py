"""T2U tune family: few-shot transfer, E2E chain, domain-adversarial.

Re-designs of lightning/systems/t2u/TransEmbTune.py (368), TransEmbE2ETune.py
(455), TransEmbDATune.py (340), TransEmbDAE2ETune.py (455):

- `t2u_tune_init`: generate the phoneme-embedding table for the target
  language from the few-shot split (Downstream1 over SSL features + two-
  stage phoneme query extraction) and transplant it into a TacoT2USystem's
  MultilingualEmbedding (TransEmbTune tune_init).
- `E2ETuneSystem`: chains a frozen pre-trained u2s BaselineSystem
  (TransEmbE2ETune.py:56-68): t2u logits -> softmax @ u2s unit-embedding
  table -> u2s FastSpeech2 -> joint loss T2U + U2S
  (TransEmbE2ETune.py:169-193).
- `DATuneSystem`: adds a gradient-reversal unit-LM discriminator loss over
  (soft) predicted unit distributions vs. real unit sequences
  (TransEmbDATune; modules.py DA).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.config import ModelConfig, OptimConfig
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.data.batch import Batch, SupInfo
from fscl_tpu.models.tacotron2_t2u import T2UConfig
from fscl_tpu.nn.losses import framewise_accuracy, framewise_ce_loss, fastspeech2_loss
from fscl_tpu.ops.masking import length_mask
from fscl_tpu.ops.segment_ops import phoneme_query_sums, queries_from_sums
from fscl_tpu.systems.t2u import (
    DA, T2UBatch, TacoT2USystem, TransEmbT2USystem,
)


def t2u_build_reference_table(
    fscl_t2u: TransEmbT2USystem,
    params: Dict[str, Any],
    sup_batches: Iterable[SupInfo],
) -> jnp.ndarray:
    """Stream the few-shot split through the meta-system's frame-feature
    generator + phoneme query extraction, accumulating per-symbol sums,
    then apply its post-extraction transform (TransEmbTune tune_init;
    TransEmbC/TransEmbC2 route through Downstream2 / codebook attention —
    t2u/TransEmbC.py:1-265, TransEmbTune.py:298-360 — via the system's
    `frame_features`/`post_table` dispatch, so passing a C or C2 meta
    system builds the codebook-path table, not the Downstream1 mean)."""
    total_sums = total_counts = None
    n_symbols = fscl_t2u.n_symbols

    # Upstream + system params are traced arguments, not closure captures:
    # jit would otherwise bake the frozen SSL weights into the HLO as
    # constants (tune.py:build_reference_table has the same contract).
    @jax.jit
    def batch_sums(upstream_params, p, wavs, wav_lens, avg_frames, phonemes):
        hidden, _ = fscl_t2u.extract_ssl(wavs, wav_lens, upstream_params)
        Tp = hidden.shape[1]
        frame_valid = length_mask(
            jnp.minimum(jnp.sum(avg_frames, -1), Tp), Tp)
        x = fscl_t2u.frame_features(p, hidden, frame_valid)
        return phoneme_query_sums(
            x[:, :, None, :], avg_frames, phonemes, n_symbols)

    for sup in sup_batches:
        sums, counts = batch_sums(
            fscl_t2u.upstream_params, params,
            jnp.asarray(sup.wavs), jnp.asarray(sup.wav_lens),
            jnp.asarray(sup.avg_frames), jnp.asarray(sup.phonemes))
        total_sums = sums if total_sums is None else total_sums + sums
        total_counts = counts if total_counts is None else total_counts + counts
    table_pre = queries_from_sums(total_sums, total_counts)[0, :, 0]
    return fscl_t2u.post_table(params, table_pre)


def t2u_tune_init(
    fscl_t2u: TransEmbT2USystem,
    fscl_params: Dict[str, Any],
    t2u_system: TacoT2USystem,
    t2u_params: Dict[str, Any],
    sup_batches: Iterable[SupInfo],
    symbol_id: str,
) -> Dict[str, Any]:
    """Embedding transplant into the supervised T2U system."""
    table = t2u_build_reference_table(fscl_t2u, fscl_params, sup_batches)
    emb = dict(t2u_params["embedding"])
    key = f"table-{symbol_id}"
    assert key in emb and emb[key].shape == table.shape
    emb[key] = table
    out = dict(t2u_params)
    out["embedding"] = emb
    return out


@SYSTEMS.register("fscl-t2u-tune", "fscl-t2u-orig-tune")
class T2UTuneSystem(TacoT2USystem):
    """Plain few-shot T2U fine-tuning (TransEmbTune/TransEmbOrigTune): after
    the `t2u_tune_init` embedding transplant, training is ordinary
    supervised TacoT2U on the few-shot split."""


class E2EBatch(NamedTuple):
    """Paired t2u + u2s data (T2U2SDataModule CombinedLoader semantics)."""
    t2u: T2UBatch
    u2s: Batch


@SYSTEMS.register("fscl-t2u-e2e-tune", "fscl-t2u-orig-e2e-tune",
                  "fscl-t2u-c-e2e-tune", "fscl-t2u-c2-e2e-tune")
class E2ETuneSystem(TacoT2USystem):
    """T2U fine-tuning chained through a FROZEN u2s BaselineSystem.

    The C/C2 keys intentionally share this class: the FINE-TUNING math of
    all e2e variants is identical; what differs between TransEmbE2ETune
    and TransEmbC/C2's tune flows is how the tune-time embedding table is
    generated, and that lives in `t2u_build_reference_table`, which
    dispatches on the META system passed to it (frame_features/post_table
    — Downstream2 for C, Downstream1+codebook for C2)."""

    def __init__(self, model_cfg: ModelConfig, optim_cfg: OptimConfig,
                 id2symbols: Tuple[Tuple[str, int], ...], t2u_cfg: T2UConfig,
                 u2s_system, u2s_params, u2s_batch_stats=None,
                 u2s_symbol_id: Optional[str] = None):
        super().__init__(model_cfg, optim_cfg, id2symbols, t2u_cfg)
        self.u2s_system = u2s_system
        self.u2s_params = jax.tree_util.tree_map(
            jax.lax.stop_gradient, u2s_params)
        self.u2s_batch_stats = u2s_batch_stats
        self.u2s_symbol_id = u2s_symbol_id

    def init_variables(self, rng, batch: E2EBatch) -> Dict[str, Any]:
        variables = super().init_variables(rng, batch.t2u)
        # the frozen u2s weights travel in TrainState.frozen as a TRACED
        # jit argument — reading self.u2s_params from the closure inside a
        # jitted train step would bake the whole FastSpeech2 param tree
        # into the HLO as constants (the remote-compile wedge fixed for
        # the tune-time table builders, systems/tune.py)
        frozen = dict(variables.get("frozen", {}))
        frozen["u2s"] = self.u2s_params
        if self.u2s_batch_stats is not None:
            frozen["u2s_batch_stats"] = self.u2s_batch_stats
        variables["frozen"] = frozen
        return variables

    def _u2s_unit_table(self, u2s_params) -> jnp.ndarray:
        """The frozen u2s unit-embedding table. A multilingual u2s checkpoint
        carries one table per symbol set; select explicitly by
        `u2s_symbol_id` (the unit symbol set the chain decodes into) rather
        than grabbing an arbitrary entry."""
        tables = u2s_params["embedding"]
        if self.u2s_symbol_id is not None:
            key = f"table-{self.u2s_symbol_id}"
            if key not in tables:
                raise KeyError(
                    f"u2s checkpoint has no embedding table {key!r}; "
                    f"available: {sorted(tables)}")
            return tables[key]
        if len(tables) != 1:
            raise ValueError(
                "u2s checkpoint is multilingual "
                f"({sorted(tables)}); pass u2s_symbol_id to select the "
                "unit table")
        return next(iter(tables.values()))

    def u2s_forward(self, t2u_logits, u2s_batch: Batch,
                    u2s_params=None, u2s_batch_stats=None):
        """(TransEmbE2ETune.common_u2s_step, TransEmbE2ETune.py:169-182):
        soft unit distribution times the frozen u2s unit-embedding table."""
        u2s_params = u2s_params if u2s_params is not None else self.u2s_params
        u2s_batch_stats = (u2s_batch_stats if u2s_batch_stats is not None
                           else self.u2s_batch_stats)
        probs = jax.nn.softmax(t2u_logits, axis=-1)
        table = self._u2s_unit_table(u2s_params)
        n_units = table.shape[0]
        probs = probs[..., :n_units]
        # The t2u side pads units (incl. <eos>) to its own bucket; the u2s
        # side strips <eos> and buckets independently — at a bucket edge
        # (max unit len == bucket) the two padded lengths diverge. Valid
        # u2s positions (src_lens, eos-stripped) are always covered by the
        # t2u logits, so reconcile statically to the u2s padded length.
        T_u = u2s_batch.durations.shape[1]
        if probs.shape[1] > T_u:
            probs = probs[:, :T_u]
        elif probs.shape[1] < T_u:
            probs = jnp.pad(
                probs, ((0, 0), (0, T_u - probs.shape[1]), (0, 0)))
        emb = jnp.einsum("btu,ud->btd", probs, table,
                         preferred_element_type=jnp.float32)
        model_vars = {"params": u2s_params["model"]}
        if u2s_batch_stats is not None:
            model_vars["batch_stats"] = u2s_batch_stats["model"]
        # unit sequence length = t2u target length here
        src_lens = u2s_batch.src_lens
        return self.u2s_system.model.apply(
            model_vars, emb, src_lens, u2s_batch.mels.shape[1],
            speaker_args=u2s_batch.speaker_args,
            mel_lens=u2s_batch.mel_lens,
            p_targets=u2s_batch.pitches, e_targets=u2s_batch.energies,
            d_targets=u2s_batch.durations, lang_args=u2s_batch.lang_ids,
        )

    def _e2e_loss(self, params, batch_stats, batch: E2EBatch, rng, train,
                  frozen=None):
        """Shared E2E chain; returns the t2u logits so subclasses (DA) can
        reuse them instead of re-running the decoder."""
        logits, _, new_bs = self.forward(
            params, batch_stats, batch.t2u, rng, train)
        t2u_loss = framewise_ce_loss(logits, batch.t2u.units)
        out = self.u2s_forward(
            logits, batch.u2s,
            u2s_params=frozen.get("u2s") if frozen else None,
            u2s_batch_stats=frozen.get("u2s_batch_stats") if frozen else None)
        u2s = fastspeech2_loss(
            out.mel, out.postnet_mel, out.pitch_prediction,
            out.energy_prediction, out.log_duration_prediction,
            batch.u2s.mels, batch.u2s.pitches, batch.u2s.energies,
            batch.u2s.durations, out.src_valid, out.mel_valid,
            self.model_cfg.variance.pitch_feature,
            self.model_cfg.variance.energy_feature)
        total = t2u_loss + u2s.total   # TransEmbE2ETune.py:184-193
        acc = framewise_accuracy(logits, batch.t2u.units)
        metrics = {
            "Total Loss": total, "T2U Loss": t2u_loss,
            "U2S Loss": u2s.total, "Acc": acc,
        }
        return total, metrics, new_bs, logits

    def loss_and_metrics(self, params, batch_stats, batch: E2EBatch, rng,
                         train, frozen=None):
        total, metrics, new_bs, _ = self._e2e_loss(
            params, batch_stats, batch, rng, train, frozen)
        return total, (metrics, new_bs)


class DABatch(NamedTuple):
    t2u: T2UBatch
    real_units: np.ndarray      # (B, T_u) unit ids from the unit LM stream
    real_unit_lens: np.ndarray


class DAE2EBatch(NamedTuple):
    t2u: T2UBatch
    u2s: Batch
    real_units: np.ndarray
    real_unit_lens: np.ndarray


@SYSTEMS.register("fscl-t2u-dae2e-tune", "fscl-t2u-da-e2e-tune",
                  "fscl-t2u-c-da-e2e-tune", "fscl-t2u-c2-da-e2e-tune")
class DAE2ETuneSystem(E2ETuneSystem):
    """E2E chain + gradient-reversal unit discriminator
    (TransEmbDAE2ETune.py): Total = T2U + U2S + DA."""

    def __init__(self, *args, da_weight: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.da = DA(self.t2u_cfg.n_units)
        self.da_weight = da_weight

    def init_variables(self, rng, batch: "DAE2EBatch") -> Dict[str, Any]:
        variables = super().init_variables(
            rng, E2EBatch(t2u=batch.t2u, u2s=batch.u2s))
        dummy = jnp.zeros(batch.t2u.units.shape + (self.t2u_cfg.n_units,))
        da_vars = self.da.init(jax.random.fold_in(rng, 11), dummy)
        variables["params"]["da"] = da_vars["params"]
        return variables

    def loss_and_metrics(self, params, batch_stats, batch: "DAE2EBatch",
                         rng, train, frozen=None):
        e2e_total, metrics, new_bs, logits = self._e2e_loss(
            params, batch_stats, E2EBatch(t2u=batch.t2u, u2s=batch.u2s),
            rng, train, frozen)
        probs = jax.nn.softmax(logits, axis=-1)
        fake_score = self.da.apply({"params": params["da"]}, probs,
                                   batch.t2u.units != 0)
        real_onehot = jax.nn.one_hot(batch.real_units, self.t2u_cfg.n_units)
        real_valid = length_mask(batch.real_unit_lens,
                                 batch.real_units.shape[1])
        real_score = self.da.apply({"params": params["da"]}, real_onehot,
                                   real_valid)
        da_loss = jnp.mean(jax.nn.softplus(-real_score)) + \
            jnp.mean(jax.nn.softplus(fake_score))
        total = e2e_total + self.da_weight * da_loss
        metrics = dict(metrics)
        metrics["DA Loss"] = da_loss
        metrics["Total Loss"] = total
        return total, (metrics, new_bs)


@SYSTEMS.register("fscl-t2u-da-tune")
class DATuneSystem(TacoT2USystem):
    """T2U fine-tuning with a gradient-reversal unit discriminator
    (TransEmbDATune; wav2vec2-U style)."""

    def __init__(self, model_cfg: ModelConfig, optim_cfg: OptimConfig,
                 id2symbols: Tuple[Tuple[str, int], ...], t2u_cfg: T2UConfig,
                 da_weight: float = 1.0):
        super().__init__(model_cfg, optim_cfg, id2symbols, t2u_cfg)
        self.da = DA(t2u_cfg.n_units)
        self.da_weight = da_weight

    def init_variables(self, rng, batch: DABatch) -> Dict[str, Any]:
        variables = super().init_variables(rng, batch.t2u)
        dummy = jnp.zeros(batch.t2u.units.shape + (self.t2u_cfg.n_units,))
        da_vars = self.da.init(jax.random.fold_in(rng, 11), dummy)
        variables["params"]["da"] = da_vars["params"]
        return variables

    def loss_and_metrics(self, params, batch_stats, batch: DABatch, rng,
                         train, frozen=None):
        logits, _, new_bs = self.forward(
            params, batch_stats, batch.t2u, rng, train)
        t2u_loss = framewise_ce_loss(logits, batch.t2u.units)

        # discriminator: fake = softmax of predictions (through GRL),
        # real = one-hot real unit stream
        probs = jax.nn.softmax(logits, axis=-1)
        fake_valid = batch.t2u.units != 0
        fake_score = self.da.apply(
            {"params": params["da"]}, probs, fake_valid)
        real_onehot = jax.nn.one_hot(batch.real_units, self.t2u_cfg.n_units)
        real_valid = length_mask(batch.real_unit_lens,
                                 batch.real_units.shape[1])
        real_score = self.da.apply(
            {"params": params["da"]}, real_onehot, real_valid)
        # discriminator maximizes real-vs-fake margin; generator (through
        # the reversal) minimizes it
        da_loss = jnp.mean(jax.nn.softplus(-real_score)) + \
            jnp.mean(jax.nn.softplus(fake_score))

        total = t2u_loss + self.da_weight * da_loss
        acc = framewise_accuracy(logits, batch.t2u.units)
        return total, ({
            "Total Loss": total, "T2U Loss": t2u_loss, "DA Loss": da_loss,
            "Acc": acc,
        }, new_bs)
