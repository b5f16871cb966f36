"""Packed training shards: one file per split, native batch reads.

SURVEY §7.1 calls for a shard writer feeding training ("TFRecord-style
shards"); the per-utterance `.npy` feature store is the canonical layout
(random access, incremental preprocessing), and this module adds a PACKED
mirror of a split for the training hot path: every utterance's training
features (phoneme ids, mel, pitch, energy, duration) laid out base
contiguously in ONE binary file with a json index of offsets/shapes.
A batch read is then one open + B seeks instead of 5*B file opens
(cpp/shard_batch.cc, ctypes; numpy fallback reads the same format).

Layout: [8-byte magic "FSCLSHRD"][uint64 index_len][index json][payload].
Index: {"records": [{"key", "offsets": {feature: [offset, shape, dtype]}},
...]}; payload stores raw little-endian C-order arrays.
"""
from __future__ import annotations

import json
import os
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MAGIC = b"FSCLSHRD"

# training features packed per utterance (texts are pre-converted phoneme
# id sequences so the reader needs no frontend)
# sample-dict key -> packed dtype (keys follow FastSpeech2Dataset samples)
PACK_DTYPES = {
    "phonemes": np.int32,
    "mel": np.float32,
    "pitch": np.float32,
    "energy": np.float32,
    "duration": np.int32,
}


# FSCL episodic shards additionally pack the raw SSL input + alignment
FSCL_PACK_DTYPES = dict(PACK_DTYPES, raw_feat=np.float32,
                        avg_frames=np.int32)


def write_packed_split(
    samples: Sequence[dict],         # dicts with keys of `features` (+id)
    path: str,
    features: Optional[Dict[str, type]] = None,
    meta: Optional[Dict] = None,
) -> int:
    """Pack samples into one shard file; returns the byte size. Sample
    arrays are converted to the canonical dtypes; `mel` is stored (T, 80)
    C-order regardless of the source layout. `features` defaults to the
    supervised-TTS set (PACK_DTYPES); pass FSCL_PACK_DTYPES for episodic
    shards. `meta` is stored verbatim in the index (e.g. n_symbols)."""
    import shutil

    features = features or PACK_DTYPES
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # stream the payload to a temp file so peak memory stays at ONE sample
    # (samples may be a lazy generator over a multi-hour corpus)
    tmp = path + ".payload.tmp"
    records = []
    pos = 0
    with open(tmp, "wb") as pf:
        for s in samples:
            offsets = {}
            for name, dtype in features.items():
                arr = np.ascontiguousarray(np.asarray(s[name], dtype))
                raw = arr.tobytes()
                offsets[name] = [pos, list(arr.shape), np.dtype(dtype).str]
                pf.write(raw)
                pos += len(raw)
            records.append({
                "key": s.get("id", ""),
                "speaker": int(s.get("speaker", 0)),
                "lang_id": int(s.get("lang_id", 0)),
                "offsets": offsets,
            })
    index = json.dumps({
        "records": records,
        "features": {k: np.dtype(v).str for k, v in features.items()},
        "meta": meta or {},
    }).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(index)))
        f.write(index)
        with open(tmp, "rb") as pf:
            shutil.copyfileobj(pf, f)
    os.remove(tmp)
    return len(MAGIC) + 8 + len(index) + pos


class PackedShard:
    """Reader over a packed split file. Batch assembly uses the C++ kernel
    when available (one call per batch), else a numpy fallback over the
    same offsets."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != MAGIC:
                raise ValueError(f"not a packed shard: {path}")
            (index_len,) = struct.unpack("<Q", f.read(8))
            self.index = json.loads(f.read(index_len))
        self.data_offset = 8 + 8 + index_len
        self.records = self.index["records"]
        self._native = None
        # probe the ACTUAL dlopen (not just the python import) so a
        # missing/broken libfsclshard.so falls back to numpy at setup
        # instead of crashing on the first collate
        try:
            from fscl_tpu.dsp.cpp_bindings import (
                _load, cpp_shard_pad_batch, cpp_shard_pad_rows,
            )
            _load("libfsclshard.so")
            self._native = cpp_shard_pad_batch
            self._native_rows = cpp_shard_pad_rows
        except Exception:
            self._native = None
            self._native_rows = None

    def __len__(self) -> int:
        return len(self.records)

    def lengths(self) -> List[int]:
        """Phoneme-sequence length per record (sampler grouping)."""
        return [r["offsets"]["phonemes"][1][0] for r in self.records]

    def _read_numpy(self, rec, name):
        off, shape, dtype = rec["offsets"][name]
        count = int(np.prod(shape)) if shape else 1
        with open(self.path, "rb") as f:
            f.seek(self.data_offset + off)
            arr = np.frombuffer(
                f.read(count * np.dtype(dtype).itemsize), dtype=dtype)
        return arr.reshape(shape)

    def collate(
        self,
        idxs: Sequence[int],
        text_buckets=None,
        mel_buckets=None,
        pitch_feature: str = "phoneme_level",
        energy_feature: str = "phoneme_level",
        L: Optional[int] = None,
        T: Optional[int] = None,
        id_offset: int = 0,
        speaker_offset: int = 0,
    ):
        """Batch of records -> (BatchMeta, Batch) with bucketed static
        shapes — same contract as data.batch.collate_batch. `L`/`T`
        override the buckets (multi-shard stitching); `id_offset`/
        `speaker_offset` re-id into the concatenated multilingual table
        space at collate time (FSCLCollate re_id semantics), so shards
        pack RAW per-language ids and stay layout-independent."""
        from fscl_tpu.data.batch import (
            Batch, BatchMeta, MEL_BUCKETS, TEXT_BUCKETS, bucket_len,
        )
        text_buckets = text_buckets or TEXT_BUCKETS
        mel_buckets = mel_buckets or MEL_BUCKETS
        recs = [self.records[int(i)] for i in idxs]
        src_lens = np.array([r["offsets"]["phonemes"][1][0] for r in recs],
                            np.int32)
        mel_lens = np.array([r["offsets"]["mel"][1][0] for r in recs],
                            np.int32)
        if L is None:
            L = bucket_len(int(src_lens.max()), text_buckets)
        if T is None:
            T = bucket_len(int(mel_lens.max()), mel_buckets)
        B = len(recs)

        var_lens = {
            "pitch": T if pitch_feature == "frame_level" else L,
            "energy": T if energy_feature == "frame_level" else L,
        }
        if self._native is not None:
            arrays = self._native(self.path, self.data_offset, recs, L, T,
                                  var_lens)
        else:
            arrays = {
                "phonemes": np.zeros((B, L), np.int32),
                "mel": np.zeros((B, T, 80), np.float32),
                "pitch": np.zeros((B, var_lens["pitch"]), np.float32),
                "energy": np.zeros((B, var_lens["energy"]), np.float32),
                "duration": np.zeros((B, L), np.int32),
            }
            for b, rec in enumerate(recs):
                for name, out in arrays.items():
                    arr = self._read_numpy(rec, name)
                    n = min(len(arr), out.shape[1])
                    out[b, :n] = arr[:n]
        texts = arrays["phonemes"]
        if id_offset:
            # real ids are >= 1; padded slots stay 0
            texts = np.where(texts != 0, texts + id_offset, 0).astype(
                np.int32)
        batch = Batch(
            speaker_args=np.array(
                [r["speaker"] + speaker_offset for r in recs], np.int32),
            texts=texts,
            src_lens=np.minimum(src_lens, L),
            mels=arrays["mel"],
            mel_lens=np.minimum(mel_lens, T),
            pitches=arrays["pitch"],
            energies=arrays["energy"],
            durations=arrays["duration"],
            lang_ids=np.array([r["lang_id"] for r in recs], np.int32),
        )
        meta = BatchMeta(ids=[r["key"] for r in recs], raw_texts=[""] * B)
        return meta, batch


def pack_split_from_store(
    split_txt: str,
    store,                            # data.feature_store.FeatureStore
    config,                           # core.config.DataConfig
    model_cfg,                        # core.config.ModelConfig
    path: str,
    stats=None,                       # core.stats.GlobalStats
    id_offset: int = 0,
    speaker_offset: int = 0,
) -> int:
    """Pack a split's training features from the feature store, applying
    the SAME normalization/level selection as FastSpeech2Dataset so the
    shard is train-ready (reads need zero further processing)."""
    from fscl_tpu.core.stats import DEFAULT_STATS
    from fscl_tpu.data.datasets import FastSpeech2Dataset

    st = stats if stats is not None else DEFAULT_STATS
    ds = FastSpeech2Dataset(
        split_txt, store, config, model_cfg,
        stats=st, id_offset=id_offset, speaker_offset=speaker_offset)
    return write_packed_split(
        (ds[i] for i in range(len(ds))), path,
        meta=provenance_meta(model_cfg, st))


def pack_fscl_split_from_store(
    split_txt: str,
    store,
    config,
    model_cfg,
    path: str,
    stats=None,
    upstream: str = "hubert_large_ll60k",
) -> int:
    """Pack an FSCL split (TTS features + raw 16 kHz wav + avg_frames) for
    shard-backed meta-episode sampling (`PackedShard.collate_episode`)."""
    from fscl_tpu.core.stats import DEFAULT_STATS
    from fscl_tpu.data.datasets import FSCLDataset

    if upstream == "mel":
        raise ValueError(
            "FSCL shards pack 1-D raw wavs; the mel-upstream variant "
            "(2-D raw_feat) is not supported — use the dataset path")
    st = stats if stats is not None else DEFAULT_STATS
    ds = FSCLDataset(
        split_txt, store, config, model_cfg, stats=st, upstream=upstream)
    if len(ds) == 0:
        raise ValueError(f"empty split: {split_txt}")
    meta = provenance_meta(model_cfg, st)
    meta.update({"n_symbols": int(ds[0]["n_symbols"]),
                 "lang_id": int(config.lang_id)})
    return write_packed_split(
        (ds[i] for i in range(len(ds))), path,
        features=FSCL_PACK_DTYPES, meta=meta)


def _episode_methods():
    """Attach episodic collation to PackedShard (kept out of the class body
    so the supervised reader stays dependency-light)."""

    def small(self, rec, name):
        return self._read_numpy(rec, name)

    def collate_episode(self, idxs, shots: int, queries: int,
                        pitch_feature: str = "phoneme_level",
                        energy_feature: str = "phoneme_level",
                        wav_dtype: str = "float32"):
        """Shard-backed FSCL episode: coverage split on the (small)
        phoneme arrays, SupInfo wavs via native 1-D batch reads, query TTS
        batch via the packed batch path. Returns systems.fscl.Episode.

        wav_dtype="int16" ships the support wavs as 16-bit PCM (4x less
        host->device transfer; frozen_upstream_features dequantizes on
        device) — lossless at bf16 upstream precision, use with
        UpstreamConfig.compute_dtype="bfloat16"."""
        from fscl_tpu.systems.fscl import Episode

        sup, _, qry_ids = self.collate_fscl_sup(idxs, shots, queries,
                                                wav_dtype)
        _, qry = self.collate([int(idxs[i]) for i in qry_ids],
                              pitch_feature=pitch_feature,
                              energy_feature=energy_feature)
        return Episode(sup=sup, qry=qry, sup_batch=None)

    def collate_fscl_sup(self, idxs, shots: int, queries: int,
                         wav_dtype: str = "float32"):
        """Coverage split + shard-native SupInfo only, returning
        (sup, sup_ids, qry_ids) — for episodic loaders whose QUERY side
        comes from elsewhere (T2U: units from the unit store) but whose
        support side is the same wav-heavy SupInfo as FSCL."""
        from fscl_tpu.data.batch import (
            SupInfo, TEXT_BUCKETS, bucket_len, pad_1d,
        )
        from fscl_tpu.data.episodic import WAV_BUCKETS, split_sup_qry

        assert "raw_feat" in self.index.get("features", {}), (
            "not an FSCL shard (pack with pack_fscl_split_from_store)")
        recs = [self.records[int(i)] for i in idxs]
        phonemes = [self._read_numpy(r, "phonemes") for r in recs]
        avg_frames = [self._read_numpy(r, "avg_frames") for r in recs]
        sup_ids, qry_ids = split_sup_qry(
            [{"phonemes": p} for p in phonemes], shots, queries)
        sup_recs = [recs[i] for i in sup_ids]
        wav_lens = np.array(
            [r["offsets"]["raw_feat"][1][0] for r in sup_recs], np.int32)
        W = bucket_len(int(wav_lens.max()), WAV_BUCKETS)
        wavs = self._read_rows(sup_recs, "raw_feat", W, np.float32)
        if wav_dtype == "int16":
            wavs = np.clip(np.rint(wavs * 32768.0), -32768, 32767) \
                .astype(np.int16)
        L = bucket_len(max(len(phonemes[i]) for i in sup_ids), TEXT_BUCKETS)
        sup = SupInfo(
            wavs=wavs, wav_lens=np.minimum(wav_lens, W),
            avg_frames=pad_1d([avg_frames[i] for i in sup_ids], L,
                              dtype=np.int32),
            phonemes=pad_1d([phonemes[i] for i in sup_ids], L,
                            dtype=np.int32),
            n_symbols=int(self.index.get("meta", {}).get("n_symbols", 0)))
        return sup, sup_ids, qry_ids

    def collate_pr_episode(self, idxs, shots: int, queries: int,
                           symbol_id: str = "en", n_symbols: int = 0):
        """Shard-backed PR episode (PREpisodicDataModule semantics):
        coverage split on the phoneme arrays, support AND query PRBatches
        with native single-call wav reads — PR episodic training carries
        raw wavs on both sides, so it is host-prep-bound exactly like the
        FSCL meta-train phase the shard format was built for. avg_frames
        in FSCL shards are 20 ms SSL-frame counts (FSCLDataset fp=0.02,
        non-mel upstreams only), matching PRDataset's segmentation."""
        from fscl_tpu.data.batch import TEXT_BUCKETS, bucket_len, pad_1d
        from fscl_tpu.data.episodic import WAV_BUCKETS, split_sup_qry
        from fscl_tpu.systems.pr import PRBatch, PREpisode

        assert "raw_feat" in self.index.get("features", {}), (
            "not an FSCL shard (pack with pack_fscl_split_from_store)")
        recs = [self.records[int(i)] for i in idxs]
        phonemes = [self._read_numpy(r, "phonemes") for r in recs]
        avg_frames = [self._read_numpy(r, "avg_frames") for r in recs]
        sup_ids, qry_ids = split_sup_qry(
            [{"phonemes": p} for p in phonemes], shots, queries)
        lang_id = int(self.index.get("meta", {}).get("lang_id", 0))

        def batch(ids):
            rs = [recs[i] for i in ids]
            wav_lens = np.array(
                [r["offsets"]["raw_feat"][1][0] for r in rs], np.int32)
            W = bucket_len(int(wav_lens.max()), WAV_BUCKETS)
            L = bucket_len(max(len(phonemes[i]) for i in ids), TEXT_BUCKETS)
            return PRBatch(
                wavs=self._read_rows(rs, "raw_feat", W, np.float32),
                wav_lens=np.minimum(wav_lens, W),
                avg_frames=pad_1d([avg_frames[i] for i in ids], L,
                                  dtype=np.int32),
                phonemes=pad_1d([phonemes[i] for i in ids], L,
                                dtype=np.int32),
                lang_ids=np.full((len(ids),), lang_id, np.int32),
                n_symbols=n_symbols, symbol_id=symbol_id)

        return PREpisode(sup=batch(sup_ids), qry=batch(qry_ids))

    def _read_rows(self, recs, name, maxlen, dtype):
        """B 1-D arrays -> zero-padded (B, maxlen); native single-call
        read when available."""
        B = len(recs)
        out = np.zeros((B, maxlen), dtype)
        if self._native_rows is not None:
            offs = np.array([r["offsets"][name][0] for r in recs], np.int64)
            rows = np.array([r["offsets"][name][1][0] for r in recs],
                            np.int64)
            self._native_rows(self.path, self.data_offset, offs, rows,
                              maxlen, out)
        else:
            for b, r in enumerate(recs):
                arr = self._read_numpy(r, name)
                n = min(len(arr), maxlen)
                out[b, :n] = arr[:n]
        return out

    PackedShard.collate_episode = collate_episode
    PackedShard.collate_fscl_sup = collate_fscl_sup
    PackedShard.collate_pr_episode = collate_pr_episode
    PackedShard._read_rows = _read_rows


_episode_methods()


class MultiShardCollate:
    """Joint-training batches over SEVERAL per-corpus shards (the 4-language
    joint config): each shard packs raw per-language ids; re-id offsets and
    speaker offsets apply at collate. A batch may span corpora — each
    shard's slice is native-read at the batch's joint (L, T) and rows are
    stitched back in order."""

    def __init__(self, shards: Sequence[PackedShard],
                 id_offsets: Sequence[int], speaker_offsets: Sequence[int]):
        self.shards = list(shards)
        self.id_offsets = list(id_offsets)
        self.speaker_offsets = list(speaker_offsets)
        self.starts = np.cumsum([0] + [len(s) for s in self.shards])

    def __len__(self) -> int:
        return int(self.starts[-1])

    def lengths(self) -> List[int]:
        out: List[int] = []
        for s in self.shards:
            out.extend(s.lengths())
        return out

    def locate(self, i: int):
        c = int(np.searchsorted(self.starts, i, side="right") - 1)
        return c, int(i) - int(self.starts[c])

    def collate(self, idxs: Sequence[int],
                pitch_feature: str = "phoneme_level",
                energy_feature: str = "phoneme_level"):
        from fscl_tpu.data.batch import (
            MEL_BUCKETS, TEXT_BUCKETS, bucket_len,
        )
        located = [self.locate(int(i)) for i in idxs]
        # joint buckets over the whole batch
        max_l = max_t = 1
        for c, j in located:
            rec = self.shards[c].records[j]
            max_l = max(max_l, rec["offsets"]["phonemes"][1][0])
            max_t = max(max_t, rec["offsets"]["mel"][1][0])
        L = bucket_len(max_l, TEXT_BUCKETS)
        T = bucket_len(max_t, MEL_BUCKETS)

        # group per shard, read each group at the joint (L, T), stitch
        per_shard: Dict[int, List[int]] = {}
        for pos, (c, j) in enumerate(located):
            per_shard.setdefault(c, []).append(pos)
        metas, parts = {}, {}
        for c, positions in per_shard.items():
            local = [located[p][1] for p in positions]
            meta, part = self.shards[c].collate(
                local, pitch_feature=pitch_feature,
                energy_feature=energy_feature, L=L, T=T,
                id_offset=self.id_offsets[c],
                speaker_offset=self.speaker_offsets[c])
            metas[c], parts[c] = meta, part

        B = len(located)

        def stitch(name):
            leaves = [np.asarray(getattr(parts[c], name)) for c in parts]
            out = np.zeros((B,) + leaves[0].shape[1:], leaves[0].dtype)
            for c, positions in per_shard.items():
                out[np.asarray(positions)] = np.asarray(
                    getattr(parts[c], name))
            return out

        from fscl_tpu.data.batch import Batch, BatchMeta
        batch = Batch(*[stitch(f) for f in Batch._fields])
        ids = [""] * B
        for c, positions in per_shard.items():
            for k, p in enumerate(positions):
                ids[p] = metas[c].ids[k]
        return BatchMeta(ids=ids, raw_texts=[""] * B), batch


def provenance_meta(model_cfg, stats) -> Dict:
    """Provenance recorded at pack time: the variance levels and
    normalization constants the packed features were produced under, so a
    shard packed for one configuration is never silently consumed by
    another (shard_compatible)."""
    v = model_cfg.variance
    return {
        "pitch_feature": v.pitch_feature,
        "energy_feature": v.energy_feature,
        "pitch_normalization": bool(v.pitch_normalization),
        "energy_normalization": bool(v.energy_normalization),
        "pitch_stats": [float(stats.pitch.mean), float(stats.pitch.std)],
        "energy_stats": [float(stats.energy.mean), float(stats.energy.std)],
    }


def shard_compatible(shard: "PackedShard", model_cfg, stats) -> bool:
    """A shard is usable for training only if its packed content matches
    the model config's variance levels and the normalization stats —
    otherwise pitch/energy targets would be silently misaligned."""
    meta = shard.index.get("meta", {})
    v = model_cfg.variance
    if meta.get("pitch_feature") != v.pitch_feature:
        return False
    if meta.get("energy_feature") != v.energy_feature:
        return False
    if bool(meta.get("pitch_normalization")) != bool(v.pitch_normalization):
        return False
    if bool(meta.get("energy_normalization")) != bool(
            v.energy_normalization):
        return False

    def close(pair, moments):
        return (pair is not None and
                abs(pair[0] - moments.mean) < 1e-6 and
                abs(pair[1] - moments.std) < 1e-6)

    if v.pitch_normalization and not close(meta.get("pitch_stats"),
                                           stats.pitch):
        return False
    if v.energy_normalization and not close(meta.get("energy_stats"),
                                            stats.energy):
        return False
    return True


def _sample_method():
    def sample(self, i: int) -> Dict:
        """Full per-record sample dict (numpy reads) — the slow-path
        equivalent of FastSpeech2Dataset/FSCLDataset __getitem__ for
        consumers that need arbitrary per-sample access (e.g. episodes
        spanning shards)."""
        rec = self.records[int(i)]
        out = {
            "id": rec["key"],
            "speaker": rec["speaker"],
            "lang_id": rec["lang_id"],
            "n_symbols": int(self.index.get("meta", {}).get("n_symbols", 0)),
        }
        for name in rec["offsets"]:
            out[name] = self._read_numpy(rec, name)
        return out

    PackedShard.sample = sample


_sample_method()
