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
from fscl_tpu.systems.maml import fast_adaptation_scan, fast_adaptation_scan_adam


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

    # The upstream weights MUST be a traced argument, not a closure capture:
    # jit would bake the ~300M frozen params into the HLO as constants
    # (the same 448x-HLO trap fixed for meta-training via TrainState.frozen),
    # which wedges compilation outright on a tunneled chip.
    @jax.jit
    def batch_sums(upstream_params, wavs, wav_lens, avg_frames, phonemes):
        hidden, _ = fscl.extract_ssl(wavs, wav_lens, upstream_params)
        return phoneme_query_sums(hidden, avg_frames, phonemes, n_symbols)

    for sup in sup_batches:
        sums, counts = batch_sums(
            fscl.upstream_params,
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


def _get_adapt_fn(baseline: BaselineSystem, symbol_id: Optional[str],
                  many: bool, optimizer: str = "sgd"):
    """Jitted adaptation scan, cached on the system instance so repeated
    calls (task after task at evaluation time) re-trace nothing.
    batch_stats and lr are dynamic arguments — changing them does not
    recompile; only a new (symbol_id, many, optimizer) triple does.
    `optimizer`: "sgd" (plain scan) or "adam" (the reference tune flows'
    Adam + grad clip, maml.fast_adaptation_scan_adam)."""
    cache = baseline.__dict__.setdefault("_adapt_jit_cache", {})
    key = (symbol_id, many, optimizer)
    fn = cache.get(key)
    if fn is None:
        scan_fn = (fast_adaptation_scan_adam if optimizer == "adam"
                   else fast_adaptation_scan)

        def single(p, bs, b, lr):
            loss_fn = _make_task_loss_fn(baseline, bs, symbol_id)
            return scan_fn(loss_fn, p, b, lr)

        if many:
            fn = jax.jit(lambda p, bs, b, lr: jax.vmap(
                lambda bb: single(p, bs, bb, lr))(b))
        else:
            fn = jax.jit(single)
        cache[key] = fn
    return fn


def adapt_on_chip(
    baseline: BaselineSystem,
    params: Dict[str, Any],
    batch_stats,
    batches: List[Batch],
    lr: float = 1e-3,
    symbol_id: Optional[str] = None,
    optimizer: str = "sgd",
):
    """Test-time adaptation as ONE lax.scan over the stacked batch sequence
    — no host round-trips between steps. Returns (adapted params,
    per-step losses)."""
    stacked = stack_batches(batches)
    fn = _get_adapt_fn(baseline, symbol_id, many=False, optimizer=optimizer)
    return fn(params, batch_stats, stacked, jnp.float32(lr))


def _make_task_loss_fn(baseline: BaselineSystem, batch_stats,
                       symbol_id: Optional[str]):
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

    return loss_fn


def adapt_on_chip_chunked(
    baseline: BaselineSystem,
    params: Dict[str, Any],
    batch_stats,
    batch_iter,
    n_steps: int,
    chunk: int = 500,
    lr: float = 1e-3,
    symbol_id: Optional[str] = None,
    optimizer: str = "sgd",
):
    """`adapt_on_chip` for long budgets (the reference adapts up to 20k
    steps, config/algorithm/language/fscl.yaml): stacking 20k batches on
    the device at once is several GB, so the budget runs as ceil(n/chunk)
    scans of `chunk` steps each. Every chunk reuses the SAME cached jitted
    scan (identical shapes — one compile total), and params stay on device
    between chunks. With optimizer="adam" the moment estimates are carried
    ACROSS chunks (maml.adam_scan_carry), so the chunked run is step-exact
    with a single long scan. Returns (adapted params, all per-step
    losses)."""
    import numpy as np

    lr_arr = jnp.float32(lr)
    losses_out = []
    done = 0
    if optimizer == "adam":
        from fscl_tpu.systems.maml import adam_carry, adam_scan_carry
        cache = baseline.__dict__.setdefault("_adapt_jit_cache", {})
        key = (symbol_id, "adam-chunk")
        fn = cache.get(key)
        if fn is None:
            def chunk_fn(carry, bs, b, lr):
                loss_fn = _make_task_loss_fn(baseline, bs, symbol_id)
                return adam_scan_carry(loss_fn, carry, b, lr)

            fn = cache[key] = jax.jit(chunk_fn)
        carry = adam_carry(params)
        while done < n_steps:
            n = min(chunk, n_steps - done)
            stacked = stack_batches([next(batch_iter) for _ in range(n)])
            carry, losses = fn(carry, batch_stats, stacked, lr_arr)
            losses_out.append(np.asarray(losses))
            done += n
        return carry[0], np.concatenate(losses_out)

    fn = _get_adapt_fn(baseline, symbol_id, many=False, optimizer=optimizer)
    while done < n_steps:
        n = min(chunk, n_steps - done)
        batches = [next(batch_iter) for _ in range(n)]
        stacked = stack_batches(batches)
        # full chunks share ONE compiled scan; a ragged tail (n_steps %
        # chunk) compiles once more — negligible against the budget
        params, losses = fn(params, batch_stats, stacked, lr_arr)
        losses_out.append(np.asarray(losses))
        done += n
    return params, np.concatenate(losses_out)


def _gather_rows(tree, i):
    """Row-gather every leaf of a leading-axis-K pytree by indices (B,)."""
    return jax.tree_util.tree_map(lambda x: jnp.take(x, i, axis=0), tree)


def _get_resident_adapt_fn(baseline: BaselineSystem,
                           symbol_id: Optional[str],
                           optimizer: str = "sgd"):
    """Jitted device-resident adaptation scan, cached like _get_adapt_fn.
    Scans over an (n_steps, B) index array and gathers each step's batch
    on device from the resident K-row support Batch."""
    cache = baseline.__dict__.setdefault("_adapt_jit_cache", {})
    key = (symbol_id, "resident", optimizer)
    fn = cache.get(key)
    if fn is None:
        scan_fn = (fast_adaptation_scan_adam if optimizer == "adam"
                   else fast_adaptation_scan)

        def run(p, bs, support, idx, lr):
            loss_fn = _make_task_loss_fn(baseline, bs, symbol_id)

            def idx_loss(pp, i):
                return loss_fn(pp, _gather_rows(support, i))

            return scan_fn(idx_loss, p, idx, lr)

        fn = cache[key] = jax.jit(run)
    return fn


def adapt_on_chip_resident(
    baseline: BaselineSystem,
    params: Dict[str, Any],
    batch_stats,
    support: Batch,
    n_steps: int,
    batch_size: Optional[int] = None,
    lr: float = 1e-3,
    symbol_id: Optional[str] = None,
    optimizer: str = "sgd",
    seed: int = 0,
):
    """Long-budget test-time adaptation with a DEVICE-RESIDENT support set.

    The few-shot train split (K utterances, collated once into a K-row
    Batch) is uploaded a single time; each scan step gathers its
    batch_size-row batch on device from a precomputed epoch-style index
    array (per-step sampling without replacement, matching the host
    dataloader semantics of the streamed path). The reference's 20k-step
    adaptation budget (config/algorithm/language/fscl.yaml) then moves
    ~300 KB of indices host->device instead of ~14 GB of re-collated
    batches — adapt_on_chip_chunked spent 386 of 637 s of the full
    rehearsal streaming those (BASELINE.md round 3).

    Same math as adapt_on_chip over the equivalent batch list: SGD or the
    reference tune flows' Adam (beta=(0.9,0.98), clip 1.0). Returns
    (adapted params, per-step losses)."""
    K = int(np.asarray(support.texts).shape[0])
    B = min(batch_size or K, K)
    rng = np.random.default_rng(seed)
    idx = np.stack([rng.choice(K, size=B, replace=False)
                    for _ in range(n_steps)]).astype(np.int32)
    fn = _get_resident_adapt_fn(baseline, symbol_id, optimizer)
    params, losses = fn(params, batch_stats, jax.device_put(support),
                        jnp.asarray(idx), jnp.float32(lr))
    return params, losses


def stack_tasks(task_batches: List[List[Batch]]) -> Batch:
    """Stack a list of per-task batch sequences into one pytree with leading
    axes (n_tasks, n_steps, ...). All tasks must share static shapes
    (bucketed padding guarantees this)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[stack_batches(b) for b in task_batches])


def adapt_many_on_chip(
    baseline: BaselineSystem,
    params: Dict[str, Any],
    batch_stats,
    task_batches: List[List[Batch]],
    lr: float = 1e-3,
    symbol_id: Optional[str] = None,
    optimizer: str = "sgd",
):
    """Adapt N independent few-shot tasks IN PARALLEL on one chip: vmap the
    on-chip adaptation scan over a task axis, so each task carries its own
    adapted copy of `params` while the MXU sees one batched program.

    The reference runs its test-time adaptation tasks strictly one after
    another (1 task per GPU process, lightning/systems/adaptor.py:21-24);
    batching tasks is the TPU-native replacement — small 4-shot batches
    alone cannot fill the MXU, N tasks at once can.

    Returns (adapted params stacked on a leading task axis,
    losses of shape (n_tasks, n_steps))."""
    stacked = stack_tasks(task_batches)
    fn = _get_adapt_fn(baseline, symbol_id, many=True, optimizer=optimizer)
    return fn(params, batch_stats, stacked, jnp.float32(lr))


def adapt_many_sharded(
    baseline: BaselineSystem,
    params: Dict[str, Any],
    batch_stats,
    task_batches: List[List[Batch]],
    mesh,
    lr: float = 1e-3,
    symbol_id: Optional[str] = None,
):
    """`adapt_many_on_chip` with the task axis sharded over the mesh's data
    axis: few-shot evaluation over many tasks scales across chips.

    Uses `shard_map`, not jit-with-shardings: tasks are embarrassingly
    parallel (zero cross-task communication), so each device should run the
    plain local program on its own task slice. This also sidesteps an SPMD
    partitioner wrong-gradient bug observed on conv kernel grads when the
    vmapped (task, batch, ...) conv backward is partitioned over the task
    axis (grad off by ~0.3 vs the per-task ground truth on an 8-device CPU
    mesh; guarded by tests/test_maml_tune.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fscl_tpu.parallel.mesh import DATA_AXIS

    n_tasks = len(task_batches)
    n_data = mesh.shape[DATA_AXIS]
    if n_tasks % n_data != 0:
        raise ValueError(
            f"n_tasks={n_tasks} must be divisible by the data axis "
            f"({n_data}) so every chip adapts the same number of tasks")
    task_sharded = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, task_sharded), stack_tasks(task_batches))
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), params)
    fn = _get_sharded_adapt_fn(baseline, symbol_id, mesh)
    return fn(params, batch_stats, stacked, jnp.float32(lr))


def _get_sharded_adapt_fn(baseline: BaselineSystem,
                          symbol_id: Optional[str], mesh):
    """Compiled shard_map adaptation, cached per (symbol_id, mesh) like
    `_get_adapt_fn`: repeated task-group evaluation re-traces nothing, and
    batch_stats/lr are traced arguments (changing them never recompiles)."""
    from jax.sharding import PartitionSpec as P

    from fscl_tpu.parallel.mesh import DATA_AXIS

    cache = baseline.__dict__.setdefault("_adapt_shard_cache", {})
    key = (symbol_id, mesh)
    fn = cache.get(key)
    if fn is None:
        def local(p, bs, b, lr):   # runs per device on its local task shard
            loss_fn = _make_task_loss_fn(baseline, bs, symbol_id)
            return jax.vmap(
                lambda bt: fast_adaptation_scan(loss_fn, p, bt, lr))(b)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False))
        cache[key] = fn
    return fn
