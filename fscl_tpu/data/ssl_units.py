"""Pseudo-unit (ssl_units) generation.

The reference consumes `ssl_units/<name>` feature sub-stores (segments,
pseudo-phoneme strings, durations, avg pitch/energy, alignment matrices —
Parsers/parser.py SSLUnitParser) produced by offline DPDP segmentation of
SSL features. This module is the writer side: run a frame-logit producer
(cluster head / protonet / k-means) over each utterance, DPDP-decode into
unit segments, and populate the sub-store so UnitDataset / t2u systems can
train on them.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np

from fscl_tpu.data.feature_store import FeatureStore
from fscl_tpu.eval.dpdp import dpdp_decode, dpdp_segment_to_time, merge_repeats


def label_propagate(
    probs: np.ndarray, n_iters: int = 2, alpha: float = 0.5,
    window: int = 2,
) -> np.ndarray:
    """Label propagation over the temporal frame graph: each frame's class
    distribution is pulled toward its neighbors', weighted by distribution
    similarity, then mixed back with the original (P <- alpha*W@P +
    (1-alpha)*P0). Confident contiguous regions reinforce each other;
    isolated noisy frames lose confidence — which is exactly what the
    downstream threshold filter (evaluate_pl_filter,
    /root/reference/evaluation/compare_unit.py:38-92) keys on."""
    P0 = probs
    P = probs
    T = len(probs)
    for _ in range(n_iters):
        acc = np.zeros_like(P)
        wsum = np.zeros((T, 1), P.dtype)
        for off in range(1, min(window, T - 1) + 1):
            w = (P[:-off] * P[off:]).sum(-1, keepdims=True)
            acc[:-off] += w * P[off:]
            wsum[:-off] += w
            acc[off:] += w * P[:-off]
            wsum[off:] += w
        smoothed = np.where(wsum > 0, acc / np.maximum(wsum, 1e-12), P)
        P = alpha * smoothed + (1.0 - alpha) * P0
        P = P / np.maximum(P.sum(-1, keepdims=True), 1e-12)
    return P


def batched_ssl_extractor(
    store: FeatureStore,
    queries: Sequence[dict],
    source: str = "hubert_base",
    layer: int = -1,
    device_batch: int = 8,
    params=None,
    cfg=None,
) -> Callable[[dict], np.ndarray]:
    """Precompute one SSL layer's hidden states for `queries` with
    bucketed, batched, JITTED upstream forwards; returns
    `extract(q) -> (T', D)` backed by the precomputed table.

    This is the throughput path for unit discovery over a real corpus
    (the reference runs its torch upstream one utterance at a time,
    evaluation/protonet.py): one compile per wav-length bucket instead of
    one per distinct length, `device_batch` utterances per device call,
    and every call dispatched before any result is read so round trips
    pipeline (same pattern as dsp/preprocess.py's batched stage 2).

    `params`: upstream variables (e.g. a converted pretrained checkpoint,
    models/hubert.py:convert_torch_checkpoint); random-init when None —
    random frozen features are still a usable clustering basis for the
    synthetic rehearsals, and no released checkpoint ships in this image.
    """
    import jax
    import jax.numpy as jnp

    from fscl_tpu.data.batch import bucket_len
    from fscl_tpu.models.hubert import make_upstream, ssl_num_frames
    from fscl_tpu.ops.masking import length_mask
    from fscl_tpu.systems.base import jit_init

    buckets = tuple(16000 * s for s in (2, 4, 6, 8, 10, 12, 15, 20))
    upstream = make_upstream(source, cfg)
    layer_idx = layer if layer >= 0 else upstream.n_layers + 1 + layer

    fns = {}

    def get_fn(bucket: int):
        if bucket not in fns:
            fns[bucket] = jax.jit(lambda p, w, v: upstream.apply(
                p, w, v)[0][:, :, layer_idx, :])
        return fns[bucket]

    wavs = {}
    groups: Dict[int, list] = {}
    for q in queries:
        w = np.asarray(
            store.wav_trim_16000.read_from_query(q)).astype(np.float32)
        key = (q["spk"], q["basename"])
        wavs[key] = w
        groups.setdefault(bucket_len(len(w), buckets), []).append(key)

    pending = []
    for bucket, keys in groups.items():
        fn = get_fn(bucket)
        for c in range(0, len(keys), device_batch):
            chunk = keys[c: c + device_batch]
            padded = np.zeros((device_batch, bucket), np.float32)
            lens = np.zeros(device_batch, np.int32)
            for row, k in enumerate(chunk):
                padded[row, : len(wavs[k])] = wavs[k]
                lens[row] = len(wavs[k])
            wb = jnp.asarray(padded)
            vb = length_mask(jnp.asarray(lens), bucket)
            if params is None:
                params = jit_init(upstream)(jax.random.PRNGKey(0), wb, vb)
            pending.append((fn(params, wb, vb), chunk, lens))

    table = {}
    for out, chunk, lens in pending:
        h = np.asarray(out)                       # (B, T', D)
        for row, k in enumerate(chunk):
            table[k] = h[row, : ssl_num_frames(int(lens[row]))]

    def extract(q):
        return table[(q["spk"], q["basename"])]

    return extract


def generate_ssl_units(
    store: FeatureStore,
    unit_name: str,
    frame_logits_fn: Callable[[dict], np.ndarray],  # query -> (T, n_units)
    queries: Optional[Sequence[dict]] = None,
    fp: float = 0.02,
    lam: float = 0.0,
    save_matrices: bool = True,
    lp_iters: int = 2,
    lp_alpha: float = 0.5,
) -> int:
    """Populate ssl_units/<unit_name> with segment/phoneme/duration features
    + duration-averaged pitch/energy aligned to the unit segmentation.

    With `save_matrices`, also writes the per-frame confidence matrices the
    reference's pseudo-label filter consumes (SSLUnitParser slots,
    /root/reference/Parsers/parser.py:136-139): `alignment_matrix` =
    1 - softmax(frame logits) and `lp_matrix` = 1 - label-propagated
    probabilities, both stored as COST matrices so that argmax(1 - mat) is
    the frame label and max(1 - mat) its confidence
    (/root/reference/evaluation/compare_unit.py:66-67)."""
    unit_store = store.get_ssl_unit_store(unit_name)
    queries = queries if queries is not None else store.load_metadata()
    n_done = 0
    n_units = None
    for q in queries:
        try:
            logits = np.asarray(frame_logits_fn(q))
        except Exception:
            continue
        n_units = logits.shape[-1]
        logp = logits - np.max(logits, axis=-1, keepdims=True)
        logp = logp - np.log(np.sum(np.exp(logp), -1, keepdims=True))
        segments, labels = dpdp_decode(logp, lam=lam)
        segments, labels = merge_repeats(segments, labels)
        time_segments = dpdp_segment_to_time(segments, fp)
        durations = np.array([e - s for s, e in segments], np.int64)

        unit_store.segment.save(
            [[float(s), float(e)] for s, e in time_segments], q)
        unit_store.phoneme.save(" ".join(str(l) for l in labels), q)
        unit_store.duration.save(durations, q)

        if save_matrices:
            probs = np.exp(logp)
            unit_store.alignment_matrix.save(
                (1.0 - probs).astype(np.float32), q)
            lp = label_propagate(probs, n_iters=lp_iters, alpha=lp_alpha)
            unit_store.lp_matrix.save((1.0 - lp).astype(np.float32), q)

        # duration-averaged pitch/energy on the unit segmentation (the
        # u2s FastSpeech2 trains on these)
        if store.interpolate_pitch.exists(q) and store.energy.exists(q):
            # unit frames are 20 ms; mel frames ~11.6 ms — map via time
            pitch = np.asarray(store.interpolate_pitch.read_from_query(q))
            energy = np.asarray(store.energy.read_from_query(q))
            mel_fp = 256 / 22050
            avg_p, avg_e = [], []
            for s, e in time_segments:
                i0, i1 = int(s / mel_fp), max(int(e / mel_fp), int(s / mel_fp) + 1)
                avg_p.append(float(pitch[i0:i1].mean()) if i0 < len(pitch) else 0.0)
                avg_e.append(float(energy[i0:i1].mean()) if i0 < len(energy) else 0.0)
            unit_store.duration_avg_pitch.save(np.asarray(avg_p, np.float32), q)
            unit_store.duration_avg_energy.save(np.asarray(avg_e, np.float32), q)
        n_done += 1
    unit_store.flush()
    if n_units is not None:
        unit_store.save_attrs({"n_units": int(n_units), "fp": fp})
    return n_done


def kmeans_unit_labeler(
    extract_features: Callable[[dict], np.ndarray],  # query -> (T, D)
    queries: Sequence[dict],
    n_units: int = 64,
    max_frames: int = 50000,
    seed: int = 0,
) -> Callable[[dict], np.ndarray]:
    """Fit k-means over pooled SSL frames, return a frame-logit function
    (negative distances) — the HuBERT-style unit discovery path."""
    import jax.numpy as jnp

    from fscl_tpu.nn.phoneme_embedding import kmeans

    pool = []
    total = 0
    for q in queries:
        feats = np.asarray(extract_features(q))
        pool.append(feats)
        total += len(feats)
        if total >= max_frames:
            break
    x = np.concatenate(pool)[:max_frames]
    centroids, _ = kmeans(jnp.asarray(x), n_units, seed=seed)
    centroids = np.asarray(centroids)

    def frame_logits(q):
        feats = np.asarray(extract_features(q))
        d = ((feats[:, None, :] - centroids[None]) ** 2).sum(-1)
        return -d

    return frame_logits
