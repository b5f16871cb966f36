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


def write_packed_split(
    samples: Sequence[dict],         # dicts with keys of PACK_DTYPES (+id)
    path: str,
) -> int:
    """Pack samples into one shard file; returns the byte size. Sample
    arrays are converted to the canonical dtypes; `mel` is stored (T, 80)
    C-order regardless of the source layout."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    records = []
    payload = bytearray()
    for s in samples:
        offsets = {}
        for name, dtype in PACK_DTYPES.items():
            arr = np.ascontiguousarray(np.asarray(s[name], dtype))
            offsets[name] = [len(payload), list(arr.shape),
                             np.dtype(dtype).str]
            payload.extend(arr.tobytes())
        records.append({
            "key": s.get("id", ""),
            "speaker": int(s.get("speaker", 0)),
            "lang_id": int(s.get("lang_id", 0)),
            "offsets": offsets,
        })
    index = json.dumps({"records": records}).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(index)))
        f.write(index)
        f.write(payload)
    return len(MAGIC) + 8 + len(index) + len(payload)


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
        try:
            from fscl_tpu.dsp.cpp_bindings import cpp_shard_pad_batch
            self._native = cpp_shard_pad_batch
        except Exception:
            self._native = None

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
    ):
        """Batch of records -> (BatchMeta, Batch) with bucketed static
        shapes — same contract as data.batch.collate_batch."""
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
        L = bucket_len(int(src_lens.max()), text_buckets)
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
        batch = Batch(
            speaker_args=np.array([r["speaker"] for r in recs], np.int32),
            texts=arrays["phonemes"],
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

    ds = FastSpeech2Dataset(
        split_txt, store, config, model_cfg,
        stats=stats if stats is not None else DEFAULT_STATS,
        id_offset=id_offset, speaker_offset=speaker_offset)
    samples = [ds[i] for i in range(len(ds))]
    return write_packed_split(samples, path)
