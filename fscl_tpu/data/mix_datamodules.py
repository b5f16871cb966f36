"""Mix / DA datamodules for the T2U tune flows.

Re-provides lightning/datamodules/t2u/MixDataModule.py:13-153
(T2U2SDataModule: re-parse data configs into paired t2u + u2s streams,
CombinedLoader semantics) and T2UDADataModule/DADataModule (t2u stream +
unit-LM stream for the discriminator).
"""
from __future__ import annotations

import os
from typing import Iterator, List, Sequence

import numpy as np

from fscl_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from fscl_tpu.core.registry import DATAMODULES
from fscl_tpu.data.batch import (
    TEXT_BUCKETS, Batch, bucket_len, collate_batch, pad_1d,
)
from fscl_tpu.data.datamodules import BaseDataModule, T2UDataModule
from fscl_tpu.data.datasets import ConcatDataset, FastSpeech2Dataset, UnitDataset


def _collate_t2u(samples):
    from fscl_tpu.systems.t2u import T2UBatch
    L = bucket_len(max(len(s["phonemes"]) for s in samples), TEXT_BUCKETS)
    TU = bucket_len(max(len(s["units"]) for s in samples), TEXT_BUCKETS)
    return T2UBatch(
        speaker_args=np.array([s["speaker"] for s in samples], np.int32),
        texts=pad_1d([s["phonemes"] for s in samples], L, dtype=np.int32),
        src_lens=np.array([min(len(s["phonemes"]), L) for s in samples],
                          np.int32),
        units=pad_1d([s["units"] for s in samples], TU, dtype=np.int32),
        unit_lens=np.array([min(len(s["units"]), TU) for s in samples],
                           np.int32),
        lang_ids=np.array([s["lang_id"] for s in samples], np.int32))


@DATAMODULES.register("fscl-t2u-e2e-tune", "fscl-t2u-orig-e2e-tune",
                      "fscl-t2u-c-e2e-tune", "fscl-t2u-c2-e2e-tune")
class T2U2SDataModule(BaseDataModule):
    """Paired t2u + u2s batches from the same utterances
    (t2u/MixDataModule.py T2U2SDataModule): the u2s side uses the unit
    sequence as text and the unit-level duration/pitch/energy features from
    the ssl_units sub-store."""

    def setup(self):
        self.pairs = []
        for dc in self.data_configs:
            path = dc.subset_path("train")
            if not (path and os.path.isfile(path) and dc.unit_name):
                continue
            t2u_ds = UnitDataset(path, self.stores[dc.name], dc)
            self.pairs.append((dc, t2u_ds))

    def _u2s_sample(self, dc: DataConfig, t2u_sample: dict) -> dict:
        """Build the u2s view: text = units, acoustic targets from the
        unit-aligned feature store. Pitch/energy are normalized with the
        global stats exactly like the supervised dataset
        (data/datasets.py:86-89) — the u2s FastSpeech2 trains on the same
        target scale either way."""
        from fscl_tpu.core.stats import DEFAULT_STATS
        store = self.stores[dc.name]
        unit_store = store.get_ssl_unit_store(dc.unit_name)
        q = {"spk": t2u_sample.get("speaker_name", ""),
             "basename": t2u_sample["id"]}
        # fall back to speaker index when name is unavailable
        units = t2u_sample["units"][:-1]        # strip <eos>
        dur = np.asarray(unit_store.duration.read_from_query(q))
        mel = np.asarray(store.mel.read_from_query(q))
        if mel.shape[0] != int(dur.sum()) and mel.shape[-1] == int(dur.sum()):
            mel = mel.T
        pitch = np.asarray(unit_store.duration_avg_pitch.read_from_query(q))
        energy = np.asarray(unit_store.duration_avg_energy.read_from_query(q))
        v = self.model_cfg.variance
        if v.pitch_normalization:
            pitch = (pitch - DEFAULT_STATS.pitch.mean) / DEFAULT_STATS.pitch.std
        if v.energy_normalization:
            energy = (energy - DEFAULT_STATS.energy.mean) / \
                DEFAULT_STATS.energy.std
        return {
            "id": t2u_sample["id"], "speaker": t2u_sample["speaker"],
            "text": "", "phonemes": units, "mel": mel[: int(dur.sum())],
            "pitch": pitch, "energy": energy, "duration": dur,
            "lang_id": t2u_sample["lang_id"], "symbol_id": dc.unit_name,
        }

    def train_batches(self):
        from fscl_tpu.systems.t2u_tune import E2EBatch
        rng = np.random.default_rng(self.train_cfg.seed)
        bs = self.train_cfg.optim.batch_size
        while True:
            dc, ds = self.pairs[int(rng.integers(0, len(self.pairs)))]
            samples = [ds[int(i)] for i in rng.integers(0, len(ds), bs)]
            t2u = _collate_t2u(samples)
            u2s_samples = [self._u2s_sample(dc, s) for s in samples]
            _, u2s = collate_batch(u2s_samples, **self._var_kw)
            yield E2EBatch(t2u=t2u, u2s=u2s)


@DATAMODULES.register("fscl-t2u", "fscl-t2u-orig", "fscl-t2u-codebook",
                      "fscl-t2u-codebook2", "fscl-t2u-c", "fscl-t2u-c2",
                      "fscl-t2u-episodic", "fscl-t2u-orig-episodic")
class T2UEpisodicDataModule(BaseDataModule):
    """Episodic T2U loader (t2u FSCLDataModule over FSCLdataset.py:64-117):
    episodes of (support raw speech + query text->unit batches) with the
    coverage-constrained split on the t2u phoneme texts."""

    def __init__(self, *args, shots: int = 4, queries: int = 2,
                 upstream: str = "hubert_large_ll60k", **kwargs):
        super().__init__(*args, **kwargs)
        self.shots = shots
        self.queries = queries
        self.upstream = upstream

    def setup(self):
        from fscl_tpu.data.datasets import FSCLDataset, UnitDataset
        self.pairs = []
        for dc in self.data_configs:
            path = dc.subset_path("train")
            if not (path and os.path.isfile(path) and dc.unit_name):
                continue
            fscl_ds = FSCLDataset(path, self.stores[dc.name], dc,
                                  self.model_cfg, upstream=self.upstream)
            unit_ds = UnitDataset(path, self.stores[dc.name], dc)
            # a fresh packed FSCL shard serves the wav-heavy SUPPORT side
            # with native single-call reads (shards.py collate_fscl_sup);
            # the unit-store query side stays python (tiny arrays)
            shard = None
            sp = path + ".fscl.shard"
            if os.path.isfile(sp):
                from fscl_tpu.data.shards import PackedShard
                sh = PackedShard(sp)
                if len(sh) == len(fscl_ds):
                    shard = sh
            self.pairs.append((dc, fscl_ds, unit_ds, shard))

    def train_batches(self):
        from fscl_tpu.data.episodic import collate_sup_info, split_sup_qry
        from fscl_tpu.systems.t2u import T2UEpisode
        rng = np.random.default_rng(self.train_cfg.seed)
        k = self.shots + self.queries
        while True:
            dc, fscl_ds, unit_ds, shard = self.pairs[
                int(rng.integers(0, len(self.pairs)))]
            idxs = rng.integers(0, len(fscl_ds), k)
            if shard is not None:
                sup, _, qry_ids = shard.collate_fscl_sup(
                    idxs, self.shots, self.queries)
            else:
                fscl_samples = [fscl_ds[int(i)] for i in idxs]
                sup_ids, qry_ids = split_sup_qry(
                    fscl_samples, self.shots, self.queries)
                sup = collate_sup_info([fscl_samples[i] for i in sup_ids])
            qry = _collate_t2u([unit_ds[int(idxs[i])] for i in qry_ids])
            yield T2UEpisode(sup=sup, qry=qry)


@DATAMODULES.register("fscl-t2u-da-tune")
class T2UDADataModule(BaseDataModule):
    """t2u stream + independent real-unit stream for the discriminator
    (t2u/T2UDADataModule)."""

    def setup(self):
        self.t2u_sets = []
        for dc in self.data_configs:
            path = dc.subset_path("train")
            if path and os.path.isfile(path) and dc.unit_name:
                self.t2u_sets.append(
                    UnitDataset(path, self.stores[dc.name], dc))
        self.train_set = ConcatDataset(self.t2u_sets)

    def train_batches(self):
        from fscl_tpu.systems.t2u_tune import DABatch
        rng = np.random.default_rng(self.train_cfg.seed)
        bs = self.train_cfg.optim.batch_size
        n = len(self.train_set)
        while True:
            samples = [self.train_set[int(i)]
                       for i in rng.integers(0, n, bs)]
            real = [self.train_set[int(i)]
                    for i in rng.integers(0, n, bs)]
            t2u = _collate_t2u(samples)
            TU = t2u.units.shape[1]
            yield DABatch(
                t2u=t2u,
                real_units=pad_1d([r["units"] for r in real], TU,
                                  dtype=np.int32),
                real_unit_lens=np.array(
                    [min(len(r["units"]), TU) for r in real], np.int32))


@DATAMODULES.register("fscl-t2u-da-e2e-tune", "fscl-t2u-dae2e-tune",
                      "fscl-t2u-c-da-e2e-tune", "fscl-t2u-c2-da-e2e-tune")
class T2U2SDADataModule(T2U2SDataModule):
    """Paired t2u+u2s batches PLUS an independent real-unit stream for the
    gradient-reversal discriminator (t2u/MixDataModule.py T2U2SDADataModule
    = T2U2S pairing + DA loader)."""

    def train_batches(self):
        from fscl_tpu.systems.t2u_tune import DAE2EBatch
        rng = np.random.default_rng(self.train_cfg.seed)
        bs = self.train_cfg.optim.batch_size
        while True:
            dc, ds = self.pairs[int(rng.integers(0, len(self.pairs)))]
            samples = [ds[int(i)] for i in rng.integers(0, len(ds), bs)]
            real = [ds[int(i)] for i in rng.integers(0, len(ds), bs)]
            t2u = _collate_t2u(samples)
            u2s_samples = [self._u2s_sample(dc, s) for s in samples]
            _, u2s = collate_batch(u2s_samples, **self._var_kw)
            TU = t2u.units.shape[1]
            yield DAE2EBatch(
                t2u=t2u, u2s=u2s,
                real_units=pad_1d([r["units"] for r in real], TU,
                                  dtype=np.int32),
                real_unit_lens=np.array(
                    [min(len(r["units"]), TU) for r in real], np.int32))
