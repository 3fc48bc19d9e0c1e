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


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None, **kw):
    """Join a multi-host (DCN-connected) JAX cluster.

    Thin wrapper over ``jax.distributed.initialize`` (SURVEY §2.3 "DCN axis
    for multi-host scaling" — the reference has nothing beyond
    single-process DataParallel, base_trainer.py:75). No-op when already
    initialized or when running single-process with no coordinator.

    Launch recipe (one process per host, e.g. under SLURM/GKE):

        # host i of N, any reachable host as coordinator
        python train.py -c cfg.json \\
            --coordinator host0:8476 --num_processes N --process_id i

    after which ``jax.devices()`` spans all hosts and ``make_hybrid_mesh()``
    lays DCN on the outer mesh axis.
    """
    if coordinator_address is None and num_processes in (None, 1):
        return False
    # Already-initialized check must NOT touch the backend:
    # jax.process_count() would initialize XLA, after which
    # jax.distributed.initialize() refuses to run (it must be the first
    # backend-touching call in the process).
    try:
        from jax._src.distributed import global_state

        if global_state.client is not None:
            return True  # already initialized
    except ImportError:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kw,
    )
    return True


def make_hybrid_mesh(devices=None, n_hosts=None, dcn_axis: str = "dcn",
                     ici_axis: str = "data") -> Mesh:
    """2-D DCN×ICI data-parallel mesh: ``(n_hosts, devices_per_host)``.

    The outer axis crosses hosts (slow DCN links), the inner axis the
    devices within a host (fast ICI). Sharding the batch over BOTH axes
    (``dp_axes``) keeps gradient reductions hierarchical: XLA's psum
    reduce-scatters within each host over ICI first and crosses DCN once
    per leaf, instead of all-reducing every shard over the slow fabric.

    Single-host (``n_hosts == 1``) degenerates to a ``(1, n)`` mesh that
    shards identically to :func:`make_mesh`.
    """
    if devices is None:
        devices = jax.devices()
    if n_hosts is None:
        n_hosts = getattr(jax, "process_count", lambda: 1)()
    n = len(devices)
    if n_hosts <= 0 or n % n_hosts:
        raise ValueError(
            f"{n} devices do not split over {n_hosts} hosts evenly"
        )
    # Host-major order so the outer axis really crosses processes; ties
    # (single process, e.g. the virtual CPU mesh in tests) fall back to
    # device id order, which still yields a valid (n_hosts, -1) factoring.
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices).reshape(n_hosts, n // n_hosts)
    return Mesh(arr, (dcn_axis, ici_axis))


def dp_axes(mesh: Mesh):
    """The mesh axes a data-parallel batch is sharded over: all of them."""
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis_name=None) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest.

    ``axis_name`` may be a single axis, a tuple of axes (hybrid DCN×ICI
    meshes shard the batch over both), or None for all mesh axes.
    """
    if axis_name is None:
        axis_name = dp_axes(mesh)
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch, axis_name=None):
    """Device-put a pytree of host arrays with the batch axis sharded.

    Batch sizes must be divisible by the mesh size; callers pad or drop
    remainders (the trainer uses drop_last batching for training).

    Multi-process (``jax.distributed``-initialized) meshes: each process
    passes its HOST-LOCAL batch — the standard multi-host contract where
    every host's loader yields its own shard — and the global batch is their
    concatenation in process order (the global batch axis is
    ``num_processes * local_batch``).
    """

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return _replicate_one(mesh, x)
        sharding = batch_sharding(mesh, x.ndim, axis_name)
        if not sharding.is_fully_addressable:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def _replicate_one(mesh: Mesh, x):
    sharding = NamedSharding(mesh, P())
    if not sharding.is_fully_addressable:
        # Every process holds the full (identical) value; build the global
        # replicated array from the local copies.
        x = np.asarray(x)
        return jax.make_array_from_single_device_arrays(
            x.shape, sharding,
            [jax.device_put(x, d) for d in sharding.addressable_devices],
        )
    return jax.device_put(x, sharding)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh.

    On multi-process meshes every process must pass the same values (the
    trainer guarantees this: params come from a seeded init or a checkpoint).
    """
    return jax.tree_util.tree_map(lambda x: _replicate_one(mesh, x), tree)
