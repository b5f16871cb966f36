"""Protonet / PR few-shot evaluation orchestration.

Re-provides evaluation/protonet.py:28-217 (and the baseline.py / linear.py
harnesses): load a PR system checkpoint, walk the generated few-shot task
dirs (`<N>-shot/task-<i>/`), build prototypes from each task's support
split, transcribe the query split (argmax/DPDP decoding), and dump per-task
transcription jsons consumable by `fscl_tpu evaluate` (PER/FER).
"""
from __future__ import annotations

import glob
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from fscl_tpu.core.config import DataConfig, ModelConfig, read_data_config
from fscl_tpu.data.datasets import PRDataset
from fscl_tpu.data.feature_store import FeatureStore
from fscl_tpu.eval.drivers import dump_task_results, evaluate_pr_task
from fscl_tpu.frontend import LANG_ID2SYMBOLS


def _pr_batch_from_samples(samples, symbol_id: str, n_symbols: int):
    from fscl_tpu.data.batch import TEXT_BUCKETS, bucket_len, pad_1d
    from fscl_tpu.data.episodic import WAV_BUCKETS
    from fscl_tpu.systems.pr import PRBatch
    L = bucket_len(max(len(s["phonemes"]) for s in samples), TEXT_BUCKETS)
    W = bucket_len(max(len(s["wav"]) for s in samples), WAV_BUCKETS)
    return PRBatch(
        wavs=pad_1d([s["wav"] for s in samples], W, dtype=np.float32),
        wav_lens=np.array([min(len(s["wav"]), W) for s in samples], np.int32),
        avg_frames=pad_1d([s["avg_frames"] for s in samples], L,
                          dtype=np.int32),
        phonemes=pad_1d([s["phonemes"] for s in samples], L, dtype=np.int32),
        lang_ids=np.array([s["lang_id"] for s in samples], np.int32),
        n_symbols=n_symbols, symbol_id=symbol_id)


def _batched_query_logits(system, params, protos, samples, symbol_id,
                          n_symbols, batch_size):
    """Transcribe query utterances through ONE cached jitted classify per
    (batch, wav-bucket, text-bucket) shape instead of an eager batch-1
    upstream forward per sample — at hubert-large scale the eager loop
    dominates evaluation wall-clock. Samples are sorted by wav length so
    chunks land in few buckets; short final chunks are padded by repeating
    the first sample (padded rows discarded). Upstream params are passed
    as runtime arguments (never baked into the program as constants)."""
    import jax

    if not samples:
        return []
    fn = system.__dict__.get("_eval_classify_jit")
    if fn is None:
        from fscl_tpu.systems.pr import PRBatch

        def classify(p, pr, wavs, wav_lens, up):
            qry = PRBatch(
                wavs=wavs, wav_lens=wav_lens,
                avg_frames=None, phonemes=None, lang_ids=None,
                n_symbols=0, symbol_id=None)
            return system.classify(p, pr, qry, upstream_params=up)

        fn = system.__dict__["_eval_classify_jit"] = jax.jit(classify)

    order = sorted(range(len(samples)), key=lambda i: len(samples[i]["wav"]))
    out = [None] * len(samples)
    for start in range(0, len(order), batch_size):
        idx = order[start:start + batch_size]
        group = [samples[i] for i in idx]
        while len(group) < batch_size:       # pad chunk to a stable shape
            group.append(group[0])
        batch = _pr_batch_from_samples(group, symbol_id, n_symbols)
        logits = np.asarray(fn(params, protos, batch.wavs, batch.wav_lens,
                               system.upstream_params))
        for k, i in enumerate(idx):
            n_frames = int(np.sum(samples[i]["avg_frames"]))
            out[i] = logits[k, :n_frames]
    return out


def batched_pr_logits(system, params, samples, symbol_id, n_symbols,
                      batch_size: int = 8):
    """`_batched_query_logits` for the linear/baseline PR heads: frame
    logits for every sample through one cached jitted `system.logits` per
    (batch, wav-bucket, text-bucket) shape. Use with
    `drivers.evaluate_pr_task` via an id()-keyed lookup (see
    run_protonet_eval)."""
    import jax

    if not samples:
        return []
    cache = system.__dict__.setdefault("_eval_logits_jit", {})
    fn = cache.get((symbol_id, n_symbols))
    if fn is None:
        from fscl_tpu.systems.pr import PRBatch

        def logits_fn(p, wavs, wav_lens, up):
            qry = PRBatch(
                wavs=wavs, wav_lens=wav_lens,
                avg_frames=None, phonemes=None, lang_ids=None,
                n_symbols=n_symbols, symbol_id=symbol_id)
            return system.logits(p, qry, upstream_params=up)

        fn = cache[(symbol_id, n_symbols)] = jax.jit(logits_fn)

    order = sorted(range(len(samples)), key=lambda i: len(samples[i]["wav"]))
    out = [None] * len(samples)
    for start in range(0, len(order), batch_size):
        idx = order[start:start + batch_size]
        group = [samples[i] for i in idx]
        while len(group) < batch_size:
            group.append(group[0])
        batch = _pr_batch_from_samples(group, symbol_id, n_symbols)
        logits = np.asarray(fn(params, batch.wavs, batch.wav_lens,
                               system.upstream_params))
        for k, i in enumerate(idx):
            n_frames = int(np.sum(samples[i]["avg_frames"]))
            out[i] = logits[k, :n_frames]
    return out


def run_trans_head_eval(
    system,                      # TransHeadPRSystem (init_upstream done)
    params,
    task_root: str,              # .../<N>-shot directory of task-<i> dirs
    output_dir: str,
    use_dpdp: bool = True,
    lam: float = 0.0,
    batch_size: int = 4,
) -> List[str]:
    """TransHead few-shot transcription over every task dir: generate the
    classification head from each task's WHOLE support split (streamed,
    frame-count-weighted single-stage queries), then transcribe the query
    split with batched jitted logits. Returns the dumped json paths."""
    import jax
    import jax.numpy as jnp

    out_paths = []
    for task_dir in sorted(glob.glob(os.path.join(task_root, "task-*"))):
        dc = read_data_config(os.path.join(task_dir, "config.yaml"))
        store = FeatureStore(dc.data_dir)
        id2symbol = {i: s.lstrip("@") for i, s in
                     enumerate(LANG_ID2SYMBOLS[dc.symbol_id])}
        n_symbols = len(LANG_ID2SYMBOLS[dc.symbol_id])

        sup_ds = PRDataset(os.path.join(task_dir, "train.txt"), store, dc)
        qry_ds = PRDataset(os.path.join(task_dir, "val.txt"), store, dc)

        # stream the support split: per-symbol frame-weighted query sums
        q_sums = q_counts = None
        for start in range(0, len(sup_ds), batch_size):
            samples = [sup_ds[i]
                       for i in range(start, min(start + batch_size,
                                                 len(sup_ds)))]
            batch = _pr_batch_from_samples(samples, dc.symbol_id, n_symbols)
            queries = np.asarray(
                system.support_frame_queries(batch))  # (1, S, n_layers, d)
            counts = np.zeros(n_symbols)
            for s in samples:
                for p, d in zip(s["phonemes"], s["avg_frames"]):
                    if d > 0:
                        counts[int(p)] += d
            w = queries[0] * counts[:, None, None]
            q_sums = w if q_sums is None else q_sums + w
            q_counts = counts if q_counts is None else q_counts + counts
        queries = (q_sums / np.maximum(q_counts, 1.0)[:, None, None])[None]
        head, _ = system.head_from_queries(params, jnp.asarray(queries))

        # batched jitted query logits against the generated head
        fn = system.__dict__.get("_eval_head_logits_jit")
        if fn is None:
            from fscl_tpu.systems.pr import PRBatch as _PRB

            def head_logits(p, hw, wavs, wav_lens, up):
                hidden, frame_valid = system.extract_ssl(wavs, wav_lens, up)
                x = system.downstream.apply(
                    {"params": p["downstream"]}, hidden, frame_valid)
                return (jnp.einsum("btd,sd->bts", x, hw,
                                   preferred_element_type=jnp.float32)
                        + p["trans_head_bias"][0])

            fn = system.__dict__["_eval_head_logits_jit"] = jax.jit(
                head_logits)

        qry_samples = [qry_ds[i] for i in range(len(qry_ds))]
        order = sorted(range(len(qry_samples)),
                       key=lambda i: len(qry_samples[i]["wav"]))
        all_logits = [None] * len(qry_samples)
        for start in range(0, len(order), batch_size):
            idx = order[start:start + batch_size]
            group = [qry_samples[i] for i in idx]
            while len(group) < batch_size:
                group.append(group[0])
            batch = _pr_batch_from_samples(group, dc.symbol_id, n_symbols)
            logits = np.asarray(fn(params, head, batch.wavs, batch.wav_lens,
                                   system.upstream_params))
            for k, i in enumerate(idx):
                n_frames = int(np.sum(qry_samples[i]["avg_frames"]))
                all_logits[i] = logits[k, :n_frames]
        by_id = {id(s): lg for s, lg in zip(qry_samples, all_logits)}

        infos = evaluate_pr_task(
            lambda sample: by_id[id(sample)], qry_samples,
            id2symbol, use_dpdp=use_dpdp, lam=lam)
        out_paths.append(dump_task_results(
            infos, output_dir, os.path.basename(task_dir)))
    return out_paths


def run_protonet_eval(
    system,                      # SSLProtoNetSystem (init_upstream done)
    params,
    task_root: str,              # .../<N>-shot directory of task-<i> dirs
    output_dir: str,
    use_dpdp: bool = True,
    lam: float = 0.0,
    batch_size: int = 4,
) -> List[str]:
    """Zero-shot protonet transcription over every task dir; returns the
    dumped json paths. Few-shot variants fine-tune `params` per task first
    (systems.tune.adapt_on_chip) and then call this."""
    out_paths = []
    for task_dir in sorted(glob.glob(os.path.join(task_root, "task-*"))):
        dc = read_data_config(os.path.join(task_dir, "config.yaml"))
        store = FeatureStore(dc.data_dir)
        id2symbol = {i: s.lstrip("@") for i, s in
                     enumerate(LANG_ID2SYMBOLS[dc.symbol_id])}
        n_symbols = len(LANG_ID2SYMBOLS[dc.symbol_id])

        sup_ds = PRDataset(os.path.join(task_dir, "train.txt"), store, dc)
        qry_ds = PRDataset(os.path.join(task_dir, "val.txt"), store, dc)

        # prototypes from the whole support split (batched accumulation
        # through the downstream + frame-level class means)
        import jax.numpy as jnp
        proto_sums = proto_counts = None
        for start in range(0, len(sup_ds), batch_size):
            samples = [sup_ds[i]
                       for i in range(start, min(start + batch_size,
                                                 len(sup_ds)))]
            batch = _pr_batch_from_samples(samples, dc.symbol_id, n_symbols)
            protos = system.build_prototypes(params, batch)
            counts = np.zeros(n_symbols)
            for s in samples:
                for p, d in zip(s["phonemes"], s["avg_frames"]):
                    if d > 0:
                        counts[int(p)] += d
            w = np.asarray(protos) * counts[:, None]
            proto_sums = w if proto_sums is None else proto_sums + w
            proto_counts = counts if proto_counts is None else \
                proto_counts + counts
        protos = proto_sums / np.maximum(proto_counts, 1.0)[:, None]
        protos = jnp.asarray(protos)

        qry_samples = [qry_ds[i] for i in range(len(qry_ds))]
        all_logits = _batched_query_logits(
            system, params, protos, qry_samples, dc.symbol_id, n_symbols,
            batch_size)
        by_id = {id(s): lg for s, lg in zip(qry_samples, all_logits)}

        infos = evaluate_pr_task(
            lambda sample: by_id[id(sample)], qry_samples,
            id2symbol, use_dpdp=use_dpdp, lam=lam)
        out_paths.append(dump_task_results(
            infos, output_dir, os.path.basename(task_dir)))
    return out_paths
