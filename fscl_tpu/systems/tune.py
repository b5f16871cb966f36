"""Few-shot transfer ("tune") flows.

Re-provides the tune systems (SURVEY §2.6, §3.3):
- `build_reference_table`: the tune_init core (tune/FastSpeech2Tune.py:42-83
  + tune/utils.py generate_reference_info) — stream the whole few-shot
  split's SSL features through the phoneme query extractor in batches
  (accumulating sums/counts), run codebook attention, return the generated
  table with PAD zeroed.
- `tune_init`: transplant that table into a BaselineSystem's
  MultilingualEmbedding (the "embedding transplant",
  tune/FastSpeech2Tune.py:71) — after which normal supervised fine-tuning
  (BaselineTuneSystem semantics) proceeds with ALL params optimized.
- `adapt_on_chip`: the 4/16/64-shot test-time adaptation loop as one
  lax.scan (north-star "few-shot inner-loop steps/sec").
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.data.batch import Batch, SupInfo
from fscl_tpu.nn.losses import fastspeech2_loss
from fscl_tpu.ops.segment_ops import phoneme_query_sums, queries_from_sums
from fscl_tpu.systems.baseline import BaselineSystem
from fscl_tpu.systems.fscl import TransEmbSystem, transplant_embedding
from fscl_tpu.systems.maml import fast_adaptation_scan


from fscl_tpu.core.registry import SYSTEMS


@SYSTEMS.register("fscl-orig-tune", "fscl-tune")
class TransEmbTuneSystem(BaselineSystem):
    """Few-shot transfer (tune/FastSpeech2Tune.py:27-111): after `tune_init`
    transplants the generated table, training is ordinary supervised
    FastSpeech2 with ALL params optimized (build_optimized_model returns
    [model, embedding_model], language/FastSpeech2.py:46-47)."""


def build_reference_table(
    fscl: TransEmbSystem,
    fscl_params: Dict[str, Any],
    sup_batches: Iterable[SupInfo],
) -> jnp.ndarray:
    """Generate the embedding table from ALL few-shot reference utterances,
    streamed in batches (tune_init, tune/FastSpeech2Tune.py:42-83)."""
    total_sums = None
    total_counts = None
    n_symbols = fscl.n_symbols

    @jax.jit
    def batch_sums(wavs, wav_lens, avg_frames, phonemes):
        hidden, _ = fscl.extract_ssl(wavs, wav_lens)
        return phoneme_query_sums(hidden, avg_frames, phonemes, n_symbols)

    for sup in sup_batches:
        sums, counts = batch_sums(
            jnp.asarray(sup.wavs), jnp.asarray(sup.wav_lens),
            jnp.asarray(sup.avg_frames), jnp.asarray(sup.phonemes))
        total_sums = sums if total_sums is None else total_sums + sums
        total_counts = counts if total_counts is None else total_counts + counts

    table_pre = queries_from_sums(total_sums, total_counts)
    table, _ = fscl.codebook.apply(
        {"params": fscl_params["codebook"]}, table_pre)
    table = table[0].at[0].set(0.0)
    return jnp.nan_to_num(table)


def tune_init(
    fscl: TransEmbSystem,
    fscl_params: Dict[str, Any],
    baseline: BaselineSystem,
    baseline_params: Dict[str, Any],
    sup_batches: Iterable[SupInfo],
    symbol_id: str,
) -> Dict[str, Any]:
    """Embedding transplant into the baseline system's table for
    `symbol_id`; returns updated baseline params (pure)."""
    table = build_reference_table(fscl, fscl_params, sup_batches)
    return transplant_embedding(baseline_params, table, symbol_id)


def stack_batches(batches: List[Batch]) -> Batch:
    """Stack same-shaped Batches along a new leading scan axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)


def adapt_on_chip(
    baseline: BaselineSystem,
    params: Dict[str, Any],
    batch_stats,
    batches: List[Batch],
    lr: float = 1e-3,
    symbol_id: Optional[str] = None,
):
    """Test-time adaptation as ONE lax.scan over the stacked batch sequence
    — no host round-trips between steps. Returns (adapted params,
    per-step losses)."""
    stacked = stack_batches(batches)

    def loss_fn(p, batch: Batch):
        out, _ = baseline.forward(p, batch_stats, batch, None, False,
                                  symbol_id=symbol_id)
        losses = fastspeech2_loss(
            out.mel, out.postnet_mel, out.pitch_prediction,
            out.energy_prediction, out.log_duration_prediction,
            batch.mels, batch.pitches, batch.energies, batch.durations,
            out.src_valid, out.mel_valid,
            baseline.model_cfg.variance.pitch_feature,
            baseline.model_cfg.variance.energy_feature)
        return losses.total

    return jax.jit(
        lambda p, b: fast_adaptation_scan(loss_fn, p, b, lr)
    )(params, stacked)
