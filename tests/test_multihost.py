"""Multi-host wiring at process_count=1 (docs/multihost.md).

The multi-process path needs real multi-host hardware; these tests pin the
single-process contracts: maybe_initialize is a strict no-op, batch
assembly equals a sharded device_put, and sampler distribution is identity.
"""
import numpy as np

import jax


def test_maybe_initialize_noop(monkeypatch):
    from fscl_tpu.parallel.multihost import maybe_initialize, process_info
    for var in ("FSCL_COORDINATOR", "FSCL_NUM_PROCESSES",
                "FSCL_PROCESS_ID", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize() is False
    assert maybe_initialize(num_processes=1) is False
    assert process_info() == (0, 1)


def test_host_local_batch_single_process():
    from fscl_tpu.parallel.mesh import make_mesh
    from fscl_tpu.parallel.multihost import host_local_batch, shard_stream

    mesh = make_mesh(n_data=jax.local_device_count())
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
             "y": np.arange(8, dtype=np.int32)}
    placed = host_local_batch(batch, mesh)
    assert placed["x"].shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(placed["y"]), batch["y"])
    # stream wrapper
    out = list(shard_stream(iter([batch, batch]), mesh))
    assert len(out) == 2
    np.testing.assert_array_equal(np.asarray(out[1]["x"]), batch["x"])


def test_maybe_distribute_identity_single_process():
    from fscl_tpu.data.samplers import GroupBatchSampler, maybe_distribute
    s = GroupBatchSampler([5, 6, 7, 8], batch_size=2, seed=0)
    assert maybe_distribute(s) is s


def test_distributed_batch_sampler_disjoint():
    from fscl_tpu.data.samplers import (
        DistributedBatchSampler, GroupBatchSampler,
    )
    base = GroupBatchSampler(list(range(8, 40)), batch_size=4, seed=1)
    all_batches = list(base)
    shards = [list(DistributedBatchSampler(
        _Replay(all_batches), num_replicas=2, rank=r)) for r in (0, 1)]
    assert shards[0] == all_batches[0::2]
    assert shards[1] == all_batches[1::2]


class _Replay:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)
