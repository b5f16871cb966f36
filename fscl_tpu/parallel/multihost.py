"""Multi-host (multi-process) runtime wiring.

The reference scales across hosts with Lightning DDP over NCCL
(main.py:34-40: Trainer(strategy=DDPStrategy)). The TPU-native equivalent is
one jax process per host, `jax.distributed.initialize` to form the global
runtime, a global `Mesh` over ALL devices, and per-host disjoint batch
streams assembled into globally-sharded arrays.

Single-process invocations are a strict no-op: `maybe_initialize()` returns
immediately when no multi-process environment is configured, so the CLI path
is unchanged on one host.

v4-8 / multi-host launch recipe (docs/multihost.md has the long version):

    # on every host of the slice (TPU VMs find the coordinator themselves):
    python -m fscl_tpu.cli train ... --distributed
    # or explicitly off-TPU:
    FSCL_COORDINATOR=host0:8476 FSCL_NUM_PROCESSES=4 FSCL_PROCESS_ID=$i \
        python -m fscl_tpu.cli train ... --distributed

After initialize, `jax.devices()` is global while `jax.local_devices()` is
this host's slice; `make_mesh` over the global devices + `host_local_batch`
produce the standard pjit input pipeline.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import numpy as np

from fscl_tpu.parallel.mesh import batch_sharding


def maybe_initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process runtime if one is configured.

    Resolution order: explicit args > FSCL_* env vars > TPU-pod automatic
    discovery (jax.distributed.initialize() with no args works on Cloud TPU
    VMs). Returns True if a multi-process runtime was started; False for the
    single-process fast path (process_count stays 1, nothing touched).
    """
    coordinator = coordinator or os.environ.get("FSCL_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["FSCL_NUM_PROCESSES"])
        if "FSCL_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["FSCL_PROCESS_ID"])
        if "FSCL_PROCESS_ID" in os.environ else None)

    if num_processes is not None and num_processes <= 1:
        return False
    if coordinator is None and num_processes is None:
        # no explicit config: only auto-init when running on a TPU pod
        # runtime that provides discovery (megascale/TPU env); otherwise
        # stay single-process
        if not os.environ.get("TPU_WORKER_HOSTNAMES"):
            return False
        jax.distributed.initialize()
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def process_info() -> tuple:
    """(process_id, process_count) — (0, 1) when not distributed."""
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def host_local_batch(global_batch, mesh) -> object:
    """Assemble a globally-sharded batch from THIS host's local shard.

    `global_batch` is the per-host pytree of numpy arrays whose leading dim
    is the host-local batch (global_batch_size / process_count). Each leaf
    becomes one global jax.Array spanning all hosts, batch-sharded over the
    mesh's data axis (the pjit input contract; multihost_utils semantics).
    Single-process: equivalent to a plain sharded device_put.
    """
    sharding = batch_sharding(mesh)

    def _make(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(_make, global_batch)


def shard_stream(batches: Iterator, mesh) -> Iterator:
    """Per-host batch stream -> globally sharded arrays. Pair with
    data.samplers.DistributedBatchSampler(sampler, process_count,
    process_index) so each host reads a disjoint subset."""
    for b in batches:
        yield host_local_batch(b, mesh)
