"""Native (C++) batch loader: whole-batch feature reads + padding.

The Python path reads ~5 .npy files per sample in `FastSpeech2Dataset._core`
and pads in `collate_batch` — per-file np.load overhead dominates host batch
prep (BASELINE.md: ~0.5 ms/sample read on this host). `NativeCollate`
replaces the per-sample loop with ONE ctypes call per (batch, feature) into
cpp/npy_batch.cc, which parses the npy headers, truncates/normalizes/pads
natively and releases the GIL while it reads.

Numerics match the Python path exactly (guarded by
tests/test_native_loader.py): same bucket selection, same normalization
((x - mean) / std applied as (x - shift) * scale in float64 before the f32
store), same mel transpose handling, same PAD semantics.

Reference role: the torch DataLoader worker processes
(lightning/datamodules/language/FastSpeech2DataModule.py) — here a native
fast path behind the same `(BatchMeta, Batch)` contract.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from fscl_tpu.core.config import DataConfig, ModelConfig
from fscl_tpu.core.stats import DEFAULT_STATS, GlobalStats
from fscl_tpu.data.batch import (
    Batch, BatchMeta, MEL_BUCKETS, TEXT_BUCKETS, bucket_len, pad_1d,
)
from fscl_tpu.data.feature_store import FeatureStore
from fscl_tpu.frontend import LANG_ID2SYMBOLS, text_to_sequence


def native_available() -> bool:
    try:
        from fscl_tpu.dsp.cpp_bindings import _load
        _load("libfsclnpy.so")
        return True
    except Exception:
        return False


class NativeCollate:
    """Batch reader over a FeatureStore using the C++ npy kernels.

    Covers the supervised FastSpeech2 path (phoneme- or frame-level
    variance features, table speakers). Callers needing raw wavs or
    d-vector slices (FSCL sup_info) keep the Python path.
    """

    def __init__(self, store: FeatureStore, config: DataConfig,
                 model_cfg: ModelConfig, stats: GlobalStats = DEFAULT_STATS,
                 id_offset: int = 0, speaker_offset: int = 0):
        self.store = store
        self.config = config
        self.model_cfg = model_cfg
        self.stats = stats
        self.id_offset = id_offset
        self.speaker_offset = speaker_offset
        self.speakers = store.load_speakers()
        self.speaker_map = {s: i for i, s in enumerate(self.speakers)}
        self.symbol_id = config.symbol_id
        # LRU-bounded: infinite-epoch streams over large corpora must not
        # grow the cache without bound
        self._text_cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._text_cache_max = 65536

    # -- per-query helpers ---------------------------------------------------
    def _texts(self, queries: List[dict]) -> List[np.ndarray]:
        out = []
        for q in queries:
            key = f"{q['spk']}-{q['basename']}"
            seq = self._text_cache.get(key)
            if seq is None:
                phonemes = self.store.phoneme.read_from_query(q)
                seq = np.asarray(text_to_sequence(
                    f"{{{phonemes}}}", self.config.text_cleaners,
                    self.symbol_id), np.int32)
                if self.id_offset:
                    seq = seq + self.id_offset
                self._text_cache[key] = seq
                if len(self._text_cache) > self._text_cache_max:
                    self._text_cache.popitem(last=False)
            else:
                self._text_cache.move_to_end(key)
            out.append(seq)
        return out

    def _feature_paths(self, feature, queries: List[dict]) -> List[str]:
        return [feature.path(q) for q in queries]

    # -- the batch read --------------------------------------------------------
    def collate(
        self,
        queries: List[dict],
        text_buckets: Sequence[int] = TEXT_BUCKETS,
        mel_buckets: Sequence[int] = MEL_BUCKETS,
        bucket: bool = True,
    ) -> Tuple[BatchMeta, Batch]:
        from fscl_tpu.dsp.cpp_bindings import (
            cpp_npy_pad_1d_f32, cpp_npy_pad_1d_i32, cpp_npy_pad_2d_f32,
        )

        store, v = self.store, self.model_cfg.variance
        texts = self._texts(queries)
        src_lens = np.array([len(t) for t in texts], np.int32)
        L = int(src_lens.max())
        if bucket:
            L = bucket_len(L, text_buckets)

        # durations first: their row sums give the mel truncation lengths
        dur, dlens = cpp_npy_pad_1d_i32(
            self._feature_paths(store.mfa_duration, queries), L)
        # same integrity contract as FastSpeech2Dataset._core: a
        # phoneme/duration count mismatch must raise, not silently pad
        expect = np.minimum(src_lens, L)
        if not np.array_equal(expect, dlens):
            bad = [queries[i]["basename"]
                   for i in np.nonzero(expect != dlens)[0]]
            raise ValueError(
                f"text/duration length mismatch for {bad} "
                f"(text {expect.tolist()} vs duration {dlens.tolist()})")
        totals = dur.sum(axis=1).astype(np.int32)
        T = int(totals.max()) if totals.max() > 0 else 1
        if bucket:
            T = bucket_len(T, mel_buckets)

        n_mels = self.model_cfg.audio.n_mels
        mels, mel_lens = cpp_npy_pad_2d_f32(
            self._feature_paths(store.mel, queries), T, n_mels,
            trunc=np.minimum(totals, T), maybe_transposed_dim=n_mels)

        p_shift, p_scale = 0.0, 1.0
        if v.pitch_normalization:
            p_shift = self.stats.pitch.mean
            p_scale = 1.0 / self.stats.pitch.std
        e_shift, e_scale = 0.0, 1.0
        if v.energy_normalization:
            e_shift = self.stats.energy.mean
            e_scale = 1.0 / self.stats.energy.std

        if v.pitch_feature == "phoneme_level":
            pitch, _ = cpp_npy_pad_1d_f32(
                self._feature_paths(store.mfa_duration_avg_pitch, queries),
                L, p_shift, p_scale)
        else:
            pitch, _ = cpp_npy_pad_1d_f32(
                self._feature_paths(store.interpolate_pitch, queries),
                T, p_shift, p_scale)
            pitch *= (np.arange(T)[None, :] < mel_lens[:, None])
        if v.energy_feature == "phoneme_level":
            energy, _ = cpp_npy_pad_1d_f32(
                self._feature_paths(store.mfa_duration_avg_energy, queries),
                L, e_shift, e_scale)
        else:
            energy, _ = cpp_npy_pad_1d_f32(
                self._feature_paths(store.energy, queries), T,
                e_shift, e_scale)
            energy *= (np.arange(T)[None, :] < mel_lens[:, None])

        # NaN gate matching the Python path's dataset asserts
        for name, arr in (("mel", mels), ("pitch", pitch),
                          ("energy", energy)):
            if np.isnan(arr).any():
                bad = [queries[i]["basename"]
                       for i in np.nonzero(
                           np.isnan(arr.reshape(len(queries), -1)).any(1))[0]]
                raise ValueError(f"NaN {name} feature for {bad}")

        speaker_args = np.array(
            [self.speaker_map[q["spk"]] + self.speaker_offset
             for q in queries], np.int32)
        batch = Batch(
            speaker_args=speaker_args,
            texts=pad_1d(texts, L, dtype=np.int32),
            src_lens=np.minimum(src_lens, L),
            mels=mels,
            mel_lens=mel_lens.astype(np.int32),
            pitches=pitch,
            energies=energy,
            durations=dur,
            lang_ids=np.full(len(queries), self.config.lang_id, np.int32),
        )
        meta = BatchMeta(
            ids=[q["basename"] for q in queries],
            raw_texts=[store.text.read_from_query(q) for q in queries],
            symbol_id=self.symbol_id,
        )
        return meta, batch
