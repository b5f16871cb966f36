"""Batch samplers.

Re-provides lightning/sampler.py:7-86: GroupBatchSampler (sort-by-length
groups to minimize padding waste — directly serves the static-shape
bucketing strategy) and DistributedBatchSampler (per-host shard of batches
for multi-host data loading, replacing Lightning's DDP split).
"""
from __future__ import annotations

import random
from typing import Iterator, List, Sequence


class GroupBatchSampler:
    """Shuffle within length-sorted groups, yield batches of near-equal
    lengths (lightning/sampler.py GroupBatchSampler)."""

    def __init__(self, lengths: Sequence[int], batch_size: int,
                 group_size_multiplier: int = 8, seed: int = 43,
                 drop_last: bool = False):
        self.lengths = list(lengths)
        self.batch_size = batch_size
        self.group_size = batch_size * group_size_multiplier
        self.rng = random.Random(seed)
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[List[int]]:
        order = list(range(len(self.lengths)))
        self.rng.shuffle(order)
        batches = []
        for g in range(0, len(order), self.group_size):
            group = sorted(order[g: g + self.group_size],
                           key=lambda i: self.lengths[i])
            for b in range(0, len(group), self.batch_size):
                batch = group[b: b + self.batch_size]
                if len(batch) == self.batch_size or not self.drop_last:
                    batches.append(batch)
        self.rng.shuffle(batches)
        return iter(batches)

    def __len__(self):
        if self.drop_last:
            return len(self.lengths) // self.batch_size
        return (len(self.lengths) + self.batch_size - 1) // self.batch_size


def maybe_distribute(sampler):
    """Shard a batch sampler across hosts when a multi-process jax runtime
    is active (parallel.multihost.maybe_initialize); identity otherwise.
    Datamodules route every train sampler through this so each host feeds
    a disjoint batch stream (the reference's DDP per-process split,
    lightning/sampler.py:50-86)."""
    try:
        import jax
        if jax.process_count() > 1:
            return DistributedBatchSampler(
                sampler, jax.process_count(), jax.process_index())
    except Exception:
        pass
    return sampler


class DistributedBatchSampler:
    """Shard a batch sampler across hosts (lightning/sampler.py:50-86):
    host `rank` takes every num_replicas-th batch, so each host feeds its
    local devices a disjoint stream (multi-host pjit input pipeline)."""

    def __init__(self, sampler, num_replicas: int, rank: int):
        assert 0 <= rank < num_replicas
        self.sampler = sampler
        self.num_replicas = num_replicas
        self.rank = rank

    def __iter__(self):
        for i, batch in enumerate(self.sampler):
            if i % self.num_replicas == self.rank:
                yield batch

    def __len__(self):
        return len(self.sampler) // self.num_replicas
