"""Batch contracts + static-shape padding.

The reference collates every task into a 13-tuple
(lightning/collates/utils.py:70-101): ids, raw_texts, speaker_args, texts,
src_lens, max_src_len, mels, mel_lens, max_mel_len, pitches, energies,
durations, lang_ids. Here the device part is a `Batch` of arrays with
*static* shapes (max lens are the padded dims, bucketed for XLA); host-only
metadata (utterance ids, raw text) rides in `BatchMeta`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence, Tuple

import flax
import numpy as np


class Batch(NamedTuple):
    speaker_args: np.ndarray    # (B,) int32 speaker ids, or DvecRefs
    texts: np.ndarray           # (B, L) int32 phoneme ids
    src_lens: np.ndarray        # (B,) int32
    mels: np.ndarray            # (B, T, n_mels) float32
    mel_lens: np.ndarray        # (B,) int32
    pitches: np.ndarray         # (B, L) float32 (phoneme_level)
    energies: np.ndarray        # (B, L) float32
    durations: np.ndarray       # (B, L) int32
    lang_ids: np.ndarray        # (B,) int32


class DvecRefs(NamedTuple):
    """Speaker-reference mel slices for the GE2E d-vector speaker paths
    ("encoder"/"dvec"/"scratch_encoder", speaker_encoder.py:115-136). The
    reference keeps a ragged list of slice tensors per utterance; here the
    slice count is padded/truncated to a static N so the whole batch is one
    jit-stable array and the padded slices are masked out of the GE2E
    average."""
    slices: np.ndarray          # (B, N, 160, 40) float32 partial-utterance mels
    mask: np.ndarray            # (B, N) float32 — 1 for real slices


def collate_dvec_refs(samples: List[dict], n_slices: int) -> DvecRefs:
    """Pad each sample's (N_i, 160, 40) spk_ref_mel_slices to a fixed
    n_slices. Truncation keeps the leading slices (resemblyzer order)."""
    first = np.asarray(samples[0]["spk_ref_mel_slices"])
    T, C = first.shape[1], first.shape[2]
    out = np.zeros((len(samples), n_slices, T, C), np.float32)
    mask = np.zeros((len(samples), n_slices), np.float32)
    for i, s in enumerate(samples):
        sl = np.asarray(s["spk_ref_mel_slices"], np.float32)[:n_slices]
        out[i, : len(sl)] = sl
        mask[i, : len(sl)] = 1.0
    return DvecRefs(out, mask)


@dataclass
class BatchMeta:
    ids: List[str]
    raw_texts: List[str]
    symbol_id: Optional[str] = None


@flax.struct.dataclass
class SupInfo:
    """Raw SSL inputs for the support set of an FSCL episode
    (FSCLCollate sup_info: wavs + avg_frames + phonemes).
    `n_symbols` is static metadata (compile-time constant under jit)."""
    wavs: np.ndarray            # (B, T_wav) float32 16 kHz
    wav_lens: np.ndarray        # (B,) int32
    avg_frames: np.ndarray      # (B, L) int32 frames per phoneme
    phonemes: np.ndarray        # (B, L) int32 phoneme ids
    n_symbols: int = flax.struct.field(pytree_node=False, default=0)


def bucket_len(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (static shapes for XLA; SURVEY §7.1)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


TEXT_BUCKETS = (32, 64, 128, 192, 256)
MEL_BUCKETS = (128, 256, 512, 768, 1000, 1024)


def pad_1d(seqs: Sequence[np.ndarray], length: int, value=0, dtype=None) -> np.ndarray:
    dtype = dtype or np.asarray(seqs[0]).dtype
    out = np.full((len(seqs), length), value, dtype=dtype)
    for i, s in enumerate(seqs):
        s = np.asarray(s)[:length]
        out[i, : len(s)] = s
    return out


def pad_2d(seqs: Sequence[np.ndarray], length: int, value=0.0) -> np.ndarray:
    dim = np.asarray(seqs[0]).shape[1]
    out = np.full((len(seqs), length, dim), value, dtype=np.float32)
    for i, s in enumerate(seqs):
        s = np.asarray(s)[:length]
        out[i, : len(s)] = s
    return out


def collate_batch(
    samples: List[dict],
    text_buckets: Sequence[int] = TEXT_BUCKETS,
    mel_buckets: Sequence[int] = MEL_BUCKETS,
    bucket: bool = True,
    dvec_slices: Optional[int] = None,
    pitch_feature: Optional[str] = None,
    energy_feature: Optional[str] = None,
) -> Tuple[BatchMeta, Batch]:
    """Samples are dicts with keys: id, text (str), phonemes (int array),
    mel (T, n_mels), pitch, energy, duration, speaker (int), lang_id (int).
    `dvec_slices`: when set and samples carry spk_ref_mel_slices, emit
    DvecRefs (padded to that static slice count) as speaker_args.
    `pitch_feature`/`energy_feature`: the variance-config level
    ("phoneme_level" | "frame_level", VarianceConfig) — when given, the
    pitch/energy targets pad to the text or mel bucket accordingly; when
    None the level is inferred from per-sample lengths (ambiguous only in
    the degenerate all-durations==1 batch).
    Equivalent of reprocess() (collates/utils.py:8-112), static-shaped.
    """
    src_lens = np.array([len(s["phonemes"]) for s in samples], dtype=np.int32)
    mel_lens = np.array(
        [len(s["mel"]) if s.get("mel") is not None else 0 for s in samples],
        dtype=np.int32,
    )
    L = int(src_lens.max())
    T = int(mel_lens.max()) if mel_lens.max() > 0 else 1
    if bucket:
        L = bucket_len(L, text_buckets)
        T = bucket_len(T, mel_buckets)

    has_mel = samples[0].get("mel") is not None
    if dvec_slices is not None and "spk_ref_mel_slices" in samples[0]:
        speaker_args = collate_dvec_refs(samples, dvec_slices)
    else:
        speaker_args = np.array(
            [s["speaker"] for s in samples], dtype=np.int32)
    # frame-level pitch/energy targets (variance config "frame_level") have
    # mel-frame length, not phoneme length — pad those to the MEL bucket so
    # the variance adaptor sees (B, T) targets (nn/variance_adaptor.py:167).
    def _var_len(key: str, feature: Optional[str]) -> int:
        if feature is not None:
            return T if (has_mel and feature == "frame_level") else L
        if has_mel and any(
                len(s[key]) != len(s["phonemes"]) for s in samples):
            return T
        return L

    batch = Batch(
        speaker_args=speaker_args,
        texts=pad_1d([s["phonemes"] for s in samples], L, dtype=np.int32),
        src_lens=np.minimum(src_lens, L),
        mels=(pad_2d([s["mel"] for s in samples], T) if has_mel
              else np.zeros((len(samples), T, 80), np.float32)),
        mel_lens=np.minimum(mel_lens, T),
        pitches=pad_1d([s["pitch"] for s in samples],
                       _var_len("pitch", pitch_feature), dtype=np.float32)
        if has_mel else np.zeros((len(samples), L), np.float32),
        energies=pad_1d([s["energy"] for s in samples],
                        _var_len("energy", energy_feature), dtype=np.float32)
        if has_mel else np.zeros((len(samples), L), np.float32),
        durations=pad_1d([s["duration"] for s in samples], L, dtype=np.int32)
        if has_mel else np.zeros((len(samples), L), np.int32),
        lang_ids=np.array([s["lang_id"] for s in samples], dtype=np.int32),
    )
    meta = BatchMeta(
        ids=[s["id"] for s in samples],
        raw_texts=[s.get("text", "") for s in samples],
        symbol_id=samples[0].get("symbol_id"),
    )
    return meta, batch
