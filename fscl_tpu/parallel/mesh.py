"""Device mesh + sharding setup.

Replaces the reference's Lightning DDP/NCCL stack (main.py:34-40, per-process
batch splitting in the datamodules) with the TPU-native recipe: one
`jax.sharding.Mesh`, batch sharded over the `data` axis, params replicated;
XLA inserts the gradient all-reduces. The mesh carries an (unused-at-parity)
`model` axis so tensor-parallel extensions don't need a redesign.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = devices[: n_data * n_model]
    arr = np.array(used).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree of arrays onto the mesh, batch-dim sharded."""
    sharding = batch_sharding(mesh)

    def _put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
