"""Datamodules: algorithm type -> train/val iterator factories.

Re-provides lightning/datamodules/ (§2.4): each datamodule owns its
datasets, samplers and collates and exposes `setup()`, `train_batches()`
(infinite iterator) and `val_batches()` (fixed list, deterministic replay
for episodic modules). Registered in DATAMODULES keyed by the same
algorithm types as the systems (lightning/datamodules/__init__.py:6-50).
"""
from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from fscl_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from fscl_tpu.core.registry import DATAMODULES
from fscl_tpu.data.batch import Batch, collate_batch
from fscl_tpu.data.datasets import (
    ConcatDataset, FSCLDataset, FastSpeech2Dataset, PRDataset, TextDataset,
    UnitDataset,
)
from fscl_tpu.data.episodic import (
    EpisodicSampler, collate_episode, collate_sup_info, get_or_create_tasks,
)
from fscl_tpu.data.feature_store import FeatureStore


def build_id2symbols(data_configs: Sequence[DataConfig]):
    """Ordered (symbol_id, n_symbols) tuple over the data configs
    (lightning/build.py:12-29 build_id2symbols) — the canonical order for
    both MultilingualEmbedding construction and re-id offsets."""
    from fscl_tpu.frontend import LANG_ID2SYMBOLS
    seen = []
    for dc in data_configs:
        if dc.symbol_id not in [s for s, _ in seen]:
            seen.append((dc.symbol_id, len(LANG_ID2SYMBOLS[dc.symbol_id])))
    return tuple(seen)


def symbol_offsets(id2symbols) -> dict:
    """symbol_id -> offset into the concatenated table (re-id increments,
    FSCLCollate.py:23-30)."""
    offsets, total = {}, 0
    for sid, n in id2symbols:
        offsets[sid] = total
        total += n
    return offsets


class BaseDataModule:
    def __init__(self, data_configs: Sequence[DataConfig],
                 model_cfg: ModelConfig, train_cfg: TrainConfig,
                 exp_dir: str = "output/exp"):
        self.data_configs = list(data_configs)
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.exp_dir = exp_dir
        self.stores = {dc.name: FeatureStore(dc.data_dir)
                       for dc in self.data_configs}
        self.id2symbols = build_id2symbols(self.data_configs)
        self.offsets = symbol_offsets(self.id2symbols)

    @property
    def _var_kw(self) -> dict:
        """Variance feature levels for collate_batch: pad pitch/energy to
        the text or mel bucket per the model config, never by per-batch
        length inference (ADVICE r2)."""
        v = self.model_cfg.variance
        return {"pitch_feature": v.pitch_feature,
                "energy_feature": v.energy_feature}

    def _datasets(self, split: str, cls, re_id: bool = False, **kw):
        out = []
        spk_offset = 0
        for dc in self.data_configs:
            path = dc.subset_path(split)
            if path and os.path.isfile(path):
                extra = {}
                if re_id:
                    extra = {"id_offset": self.offsets[dc.symbol_id],
                             "speaker_offset": spk_offset}
                ds = cls(path, self.stores[dc.name], dc, self.model_cfg,
                         **extra, **kw)
                spk_offset += len(ds.speakers)
                out.append(ds)
        return out


@DATAMODULES.register("baseline", "baseline-tune", "fscl-orig-tune",
                      "fscl-tune")
class FastSpeech2DataModule(BaseDataModule):
    """Plain multilingual supervised loader
    (FastSpeech2DataModule.py:12-136). `re_id=True` maps phoneme ids into
    concatenated-table space for multilingual joint training; tune flows
    pass re_id=False (FastSpeech2DataModule.py:136 — single-language table
    addressed by symbol_id with raw ids)."""

    def __init__(self, *args, re_id: bool = True, native_io: bool = True,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.re_id = re_id
        self.native_io = native_io
        # d-vector speaker paths consume per-utterance reference mel slices
        # instead of speaker ids (speaker_encoder.py:115-136); the dataset
        # then loads spk_ref_mel_slices and the collate pads them to a
        # static slice count
        spk = self.model_cfg.speaker
        self.dvec_slices = spk.n_ref_slices if spk.uses_dvec else None

    def setup(self):
        kw = {"spk_refer_wav": True} if self.dvec_slices else {}
        self.train_set = ConcatDataset(
            self._datasets("train", FastSpeech2Dataset, re_id=self.re_id, **kw))
        val = self._datasets("val", FastSpeech2Dataset, re_id=self.re_id, **kw)
        self.val_set = ConcatDataset(val) if val else None
        # native C++ batch reads for the single-corpus case (monolingual
        # training + the tune flows): one ctypes call per (batch, feature)
        # instead of per-sample np.loads (data/native_loader.py). A packed
        # shard next to the split (`<train.txt>.shard`, data/shards.py —
        # written by `fscl_tpu pack`) is preferred: one file, one native
        # call per batch.
        self._native = None
        self._shard = None
        if self.native_io and self.dvec_slices is None:
            # packed shards: single corpus uses the shard directly; the
            # multi-corpus joint case stitches per-corpus shards with
            # collate-time re-id offsets (data/shards.py MultiShardCollate)
            from fscl_tpu.data.shards import (
                MultiShardCollate, PackedShard, shard_compatible,
            )
            shards = []
            for ds in self.train_set.datasets:
                sp = None
                for dc in self.data_configs:
                    if dc.name == ds.config.name:
                        sp = (dc.subset_path("train") or "") + ".shard"
                        break
                if sp and os.path.isfile(sp):
                    sh = PackedShard(sp)
                    # stale (count mismatch) or packed under a different
                    # variance/normalization config -> fall back
                    if len(sh) == len(ds) and shard_compatible(
                            sh, self.model_cfg, ds.stats):
                        shards.append(sh)
                        continue
                shards = None
                break
            if shards:
                ds0 = self.train_set.datasets[0]
                if len(shards) == 1 and ds0.id_offset == 0 and \
                        ds0.speaker_offset == 0:
                    self._shard = shards[0]
                else:
                    self._shard = MultiShardCollate(
                        shards,
                        [d.id_offset for d in self.train_set.datasets],
                        [d.speaker_offset for d in self.train_set.datasets])
        if self._shard is None and self.native_io and \
                self.dvec_slices is None and \
                len(self.train_set.datasets) == 1:
            ds = self.train_set.datasets[0]
            from fscl_tpu.data.native_loader import (
                NativeCollate, native_available,
            )
            if native_available():
                self._native = NativeCollate(
                    ds.store, ds.config, self.model_cfg, ds.stats,
                    id_offset=ds.id_offset,
                    speaker_offset=ds.speaker_offset)

    def train_batches(self) -> Iterator[Batch]:
        """Infinite epochs of length-grouped batches (GroupBatchSampler,
        lightning/sampler.py semantics — near-equal lengths per batch so
        bucketed padding wastes little)."""
        from fscl_tpu.data.samplers import GroupBatchSampler
        bs = self.train_cfg.optim.batch_size
        # approximate lengths from split-txt phoneme strings (no feature IO)
        lengths = []
        for ds in self.train_set.datasets:
            lengths.extend(
                len(q["phonemes"].strip("{}").split()) for q in ds.queries)
        from fscl_tpu.data.samplers import maybe_distribute
        epoch = 0
        while True:
            sampler = maybe_distribute(GroupBatchSampler(
                lengths, bs, seed=self.train_cfg.seed + epoch))
            for idxs in sampler:
                if self._shard is not None:
                    _, batch = self._shard.collate(idxs, **self._var_kw)
                elif self._native is not None:
                    ds = self.train_set.datasets[0]
                    _, batch = self._native.collate(
                        [ds.queries[int(i)] for i in idxs])
                else:
                    _, batch = collate_batch(
                        [self.train_set[int(i)] for i in idxs],
                        dvec_slices=self.dvec_slices, **self._var_kw)
                yield batch
            epoch += 1

    def full_train_batch(self, max_utts: int = 128) -> Optional[Batch]:
        """The whole train split collated as ONE bucket-padded K-row Batch,
        for device-resident adaptation (tune.adapt_on_chip_resident): the
        few-shot tune splits are 4-64 utterances, so the 20k-step scan can
        gather each step's batch on device instead of streaming host
        batches. Returns None when the split exceeds `max_utts` (resident
        padding would waste memory) or carries d-vector reference slices
        (ragged extras the row-gather does not model)."""
        n = len(self.train_set)
        if n == 0 or n > max_utts or self.dvec_slices is not None:
            return None
        idxs = np.arange(n)
        if self._shard is not None:
            return self._shard.collate(idxs, **self._var_kw)[1]
        if self._native is not None:
            ds = self.train_set.datasets[0]
            return self._native.collate(
                [ds.queries[int(i)] for i in idxs])[1]
        return collate_batch([self.train_set[int(i)] for i in idxs],
                             **self._var_kw)[1]

    def val_batches(self) -> List[Batch]:
        if self.val_set is None:
            return []
        bs = self.train_cfg.optim.batch_size
        out = []
        for start in range(0, min(len(self.val_set), 8 * bs), bs):
            samples = [self.val_set[i]
                       for i in range(start, min(start + bs, len(self.val_set)))]
            if samples:
                out.append(collate_batch(
                    samples, dvec_slices=self.dvec_slices,
                    **self._var_kw)[1])
        return out


@DATAMODULES.register("fscl", "fscl-orig", "fscl-orig2", "maml", "meta",
                      "imaml",
                      "semi-fscl", "semi-fscl-tune", "fscl-ada",
                      "fscl-ada1", "fscl-ada2", "fscl-ssl_ada",
                      "fscl-ssl_ada1", "fscl-ssl_ada2", "fscl-tune-src")
class FSCLDataModule(BaseDataModule):
    """Meta-episodic loader (FSCLDataModule.py:13-364): labels = language;
    train = infinite episode sampling; val = fixed tasks with deterministic
    replay (prefetch under the global seed, descriptions persisted)."""

    def __init__(self, *args, shots: int = 32, queries: int = 8,
                 n_tasks_per_label: int = 8, with_sup_batch: bool = False,
                 with_qry_wavs: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.shots = shots
        self.queries = queries
        self.n_tasks_per_label = n_tasks_per_label
        self.with_sup_batch = with_sup_batch   # MAML inner loops
        self.with_qry_wavs = with_qry_wavs     # SSL-ADA query speech

    def setup(self):
        datasets = self._datasets(
            "train", FSCLDataset, upstream=self.model_cfg.upstream.name)
        self.train_set = ConcatDataset(datasets)
        labels = []
        for d in datasets:
            labels.extend([d.config.lang_id] * len(d))
        self.sampler = EpisodicSampler(
            labels, self.shots, self.queries, seed=self.train_cfg.seed)
        val_datasets = self._datasets(
            "val", FSCLDataset, upstream=self.model_cfg.upstream.name)
        self.val_set = ConcatDataset(val_datasets) if val_datasets else None
        if self.val_set is not None:
            val_labels = []
            for d in val_datasets:
                val_labels.extend([d.config.lang_id] * len(d))
            self.val_sampler = EpisodicSampler(
                val_labels, self.shots, self.queries,
                seed=self.train_cfg.seed)

    def train_batches(self):
        from fscl_tpu.data.samplers import maybe_distribute
        for idxs in maybe_distribute(self.sampler.infinite()):
            samples = [self.train_set[i] for i in idxs]
            yield collate_episode(samples, self.shots, self.queries,
                                  with_sup_batch=self.with_sup_batch,
                                  with_qry_wavs=self.with_qry_wavs,
                                  var_kw=self._var_kw)

    def val_batches(self):
        if self.val_set is None:
            return []
        path = os.path.join(self.exp_dir, "val_descriptions.json")
        tasks = get_or_create_tasks(self.val_sampler,
                                    self.n_tasks_per_label, path)
        out = []
        for idxs in tasks:
            samples = [self.val_set[i] for i in idxs]
            out.append(collate_episode(samples, self.shots, self.queries,
                                       with_sup_batch=self.with_sup_batch,
                                       with_qry_wavs=self.with_qry_wavs,
                                       var_kw=self._var_kw))
        return out


@DATAMODULES.register("tacot2u", "fscl-t2u-tune", "fscl-t2u-orig-tune")
class T2UDataModule(BaseDataModule):
    """Text->unit loader (t2u/T2UDataModule.py:13-126)."""

    def setup(self):
        datasets = []
        for dc in self.data_configs:
            path = dc.subset_path("train")
            if path and os.path.isfile(path):
                datasets.append(UnitDataset(path, self.stores[dc.name], dc))
        self.train_set = ConcatDataset(datasets)

    def train_batches(self):
        from fscl_tpu.data.batch import TEXT_BUCKETS, bucket_len, pad_1d
        from fscl_tpu.systems.t2u import T2UBatch
        rng = np.random.default_rng(self.train_cfg.seed)
        bs = self.train_cfg.optim.batch_size
        n = len(self.train_set)
        while True:
            samples = [self.train_set[int(i)]
                       for i in rng.integers(0, n, bs)]
            L = bucket_len(max(len(s["phonemes"]) for s in samples),
                           TEXT_BUCKETS)
            TU = bucket_len(max(len(s["units"]) for s in samples),
                            TEXT_BUCKETS)
            yield T2UBatch(
                speaker_args=np.array([s["speaker"] for s in samples],
                                      np.int32),
                texts=pad_1d([s["phonemes"] for s in samples], L,
                             dtype=np.int32),
                src_lens=np.array(
                    [min(len(s["phonemes"]), L) for s in samples], np.int32),
                units=pad_1d([s["units"] for s in samples], TU,
                             dtype=np.int32),
                unit_lens=np.array(
                    [min(len(s["units"]), TU) for s in samples], np.int32),
                lang_ids=np.array([s["lang_id"] for s in samples], np.int32),
            )


@DATAMODULES.register("pr-ssl-linear", "pr-ssl-linear-tune",
                      "pr-ssl-baseline", "pr-ssl-baseline-tune",
                      "pr-ssl-cluster", "pr-ssl-cluster-tune")
class PRDataModule(BaseDataModule):
    """SSL PR loader with same-dataset batches (MultiTaskSampler semantics:
    every batch comes from ONE dataset so the per-language head is
    consistent)."""

    def setup(self):
        self.datasets = []
        for dc in self.data_configs:
            path = dc.subset_path("train")
            if path and os.path.isfile(path):
                self.datasets.append(
                    (dc, PRDataset(path, self.stores[dc.name], dc)))

    def train_batches(self):
        from fscl_tpu.data.batch import TEXT_BUCKETS, bucket_len, pad_1d
        from fscl_tpu.data.episodic import WAV_BUCKETS
        from fscl_tpu.frontend import n_symbols as n_sym_of
        from fscl_tpu.systems.pr import PRBatch
        rng = np.random.default_rng(self.train_cfg.seed)
        bs = self.train_cfg.optim.batch_size
        while True:
            dc, ds = self.datasets[int(rng.integers(0, len(self.datasets)))]
            samples = [ds[int(i)] for i in rng.integers(0, len(ds), bs)]
            L = bucket_len(max(len(s["phonemes"]) for s in samples),
                           TEXT_BUCKETS)
            W = bucket_len(max(len(s["wav"]) for s in samples), WAV_BUCKETS)
            yield PRBatch(
                wavs=pad_1d([s["wav"] for s in samples], W, dtype=np.float32),
                wav_lens=np.array(
                    [min(len(s["wav"]), W) for s in samples], np.int32),
                avg_frames=pad_1d([s["avg_frames"] for s in samples], L,
                                  dtype=np.int32),
                phonemes=pad_1d([s["phonemes"] for s in samples], L,
                                dtype=np.int32),
                lang_ids=np.array([s["lang_id"] for s in samples], np.int32),
                n_symbols=n_sym_of(dc.symbol_id),
                symbol_id=dc.symbol_id,
            )


@DATAMODULES.register("pr-ssl-protonet", "pr-fscl", "pr-fscl-tune",
                      "pr-trans-head", "pr-trans-head-tune")
class PREpisodicDataModule(BaseDataModule):
    """Episodic PR loader for protonet/PR-FSCL (phoneme_recognition
    FSCLDataModule): label-grouped K+Q episodes of PR samples with the
    coverage-constrained support/query split."""

    def __init__(self, *args, shots: int = 4, queries: int = 2, **kwargs):
        super().__init__(*args, **kwargs)
        self.shots = shots
        self.queries = queries

    def setup(self):
        from fscl_tpu.data.datasets import PRDataset
        self.datasets = []
        for dc in self.data_configs:
            path = dc.subset_path("train")
            if not (path and os.path.isfile(path)):
                continue
            ds = PRDataset(path, self.stores[dc.name], dc)
            # a packed FSCL shard next to the split carries everything a
            # PR episode needs (wavs + phonemes + avg_frames at the 20 ms
            # SSL frame rate) — prefer its native single-call batch reads
            # (data/shards.py collate_pr_episode); stale shards rejected
            shard = None
            sp = path + ".fscl.shard"
            if os.path.isfile(sp):
                from fscl_tpu.data.shards import PackedShard
                sh = PackedShard(sp)
                if len(sh) == len(ds):
                    shard = sh
            self.datasets.append((dc, ds, shard))

    def _collate_pr(self, dc, samples):
        from fscl_tpu.data.batch import TEXT_BUCKETS, bucket_len, pad_1d
        from fscl_tpu.data.episodic import WAV_BUCKETS
        from fscl_tpu.frontend import n_symbols as n_sym_of
        from fscl_tpu.systems.pr import PRBatch
        L = bucket_len(max(len(s["phonemes"]) for s in samples), TEXT_BUCKETS)
        W = bucket_len(max(len(s["wav"]) for s in samples), WAV_BUCKETS)
        return PRBatch(
            wavs=pad_1d([s["wav"] for s in samples], W, dtype=np.float32),
            wav_lens=np.array([min(len(s["wav"]), W) for s in samples],
                              np.int32),
            avg_frames=pad_1d([s["avg_frames"] for s in samples], L,
                              dtype=np.int32),
            phonemes=pad_1d([s["phonemes"] for s in samples], L,
                            dtype=np.int32),
            lang_ids=np.array([s["lang_id"] for s in samples], np.int32),
            n_symbols=n_sym_of(dc.symbol_id),
            symbol_id=dc.symbol_id,
        )

    def train_batches(self):
        from fscl_tpu.data.episodic import split_sup_qry
        from fscl_tpu.frontend import n_symbols as n_sym_of
        from fscl_tpu.systems.pr import PREpisode
        rng = np.random.default_rng(self.train_cfg.seed)
        k = self.shots + self.queries
        while True:
            dc, ds, shard = self.datasets[
                int(rng.integers(0, len(self.datasets)))]
            idxs = rng.integers(0, len(ds), k)
            if shard is not None:
                yield shard.collate_pr_episode(
                    idxs, self.shots, self.queries,
                    symbol_id=dc.symbol_id,
                    n_symbols=n_sym_of(dc.symbol_id))
                continue
            samples = [ds[int(i)] for i in idxs]
            sup_ids, qry_ids = split_sup_qry(samples, self.shots, self.queries)
            yield PREpisode(
                sup=self._collate_pr(dc, [samples[i] for i in sup_ids]),
                qry=self._collate_pr(dc, [samples[i] for i in qry_ids]))


def get_datamodule(algorithm_type: str):
    """(lightning/datamodules/__init__.py:49-50)."""
    return DATAMODULES.get(algorithm_type)


@DATAMODULES.register("conti-ae")
class ContiAEDataModule(BaseDataModule):
    """Speech-reconstruction loader for ContiAE (language
    ContiAEDataModule): raw 16 kHz wav (SSL input) + target mel, bucketed
    static shapes."""

    def setup(self):
        from fscl_tpu.data.datasets import ContiAEDataset
        datasets = []
        for dc in self.data_configs:
            path = dc.subset_path("train")
            if path and os.path.isfile(path):
                datasets.append(
                    ContiAEDataset(path, self.stores[dc.name], dc))
        self.train_set = ConcatDataset(datasets)

    def train_batches(self):
        from fscl_tpu.data.datasets import collate_conti_ae
        rng = np.random.default_rng(self.train_cfg.seed)
        bs = self.train_cfg.optim.batch_size
        n = len(self.train_set)
        while True:
            yield collate_conti_ae(
                [self.train_set[int(i)] for i in rng.integers(0, n, bs)])


_EPISODIC_KEYS = ("fscl", "fscl-orig", "fscl-orig2", "maml", "semi-fscl",
                  "semi-fscl-tune", "fscl-ada", "fscl-ada1", "fscl-ada2",
                  "fscl-ssl_ada", "fscl-ssl_ada1", "fscl-ssl_ada2",
                  "fscl-tune-src")


def datamodule_kwargs_for(algorithm: str, algo_cfg=None) -> dict:
    """Per-algorithm constructor kwargs for the generic datamodule path:
    MAML-style systems need the support set as a full batch for inner-loop
    losses (collate_episode with_sup_batch), the SSL-ADA unsupervised
    stages need the query set's raw speech (with_qry_wavs), and episodic
    modules take shots/queries from the algorithm config. The reference
    encodes this inside per-system collates (FSCLCollate variants) +
    few_shot_task_dataset args."""
    kw = {}
    if algorithm in ("fscl-orig2", "maml", "meta", "imaml",
                     "semi-fscl", "semi-fscl-tune"):
        kw["with_sup_batch"] = True
    if "ssl_ada" in algorithm:
        kw["with_qry_wavs"] = True
    if algo_cfg is not None and algorithm in _EPISODIC_KEYS:
        kw["shots"] = algo_cfg.adapt.shots
        kw["queries"] = algo_cfg.adapt.queries
    return kw
