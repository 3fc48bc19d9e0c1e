"""Mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all local devices (or the given list)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Device-put a pytree of host arrays with the batch axis sharded.

    Batch sizes must be divisible by the mesh size; callers pad or drop
    remainders (the trainer uses drop_last batching for training).
    """

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
