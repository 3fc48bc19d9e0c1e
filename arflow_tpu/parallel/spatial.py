"""Spatial (H-axis) sharding for very large frames.

SURVEY.md §2.3 / §5 name spatial sharding of H×W as the CNN-relevant
scale-out axis beyond data parallelism (the reference has no analog — its
only strategy is DataParallel, trainer/base_trainer.py:75). The TPU-native
route needs no manual halo code: inputs carry a ``NamedSharding`` that
splits the image-height axis across the mesh, and GSPMD partitions every
conv in the coarse-to-fine stack, inserting the one-row halo exchanges
(collective-permutes) and the moment/cost-volume collectives itself.

Use cases: frames too large for one chip's HBM at batch>=1 (e.g. 2K/4K
inference), or latency-bound single-frame inference where batch
parallelism cannot help. For throughput at the shipped resolutions, batch
sharding (``make_mesh``/``shard_batch``) remains the right axis — spatial
sharding trades collective traffic for per-chip footprint.

Notes:
  - The fused Pallas cost volume is an opaque custom call GSPMD cannot
    partition; under a spatial mesh keep ``ARFLOW_USE_PALLAS=0`` (the XLA
    shifted-product formulation partitions cleanly). ``spatial_apply``
    does this automatically at trace time.
  - Warp gathers address arbitrary rows; GSPMD resolves them by gathering
    the (feature-level) source — correct, with collective cost. Validated
    numerically on the virtual CPU mesh (tests/test_spatial_sharding.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(devices=None, n_spatial: int | None = None,
                      batch_axis: str = "data",
                      spatial_axis: str = "space") -> Mesh:
    """2-D (data, space) mesh: batch × image-height parallelism.

    ``n_spatial`` devices split H (default: all of them, pure spatial);
    the remaining factor shards the batch. ``n_spatial=4`` over 8 chips
    gives a (2, 4) mesh: 2-way batch x 4-way height.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_spatial is None:
        n_spatial = n
    if n_spatial <= 0 or n % n_spatial:
        raise ValueError(f"{n} devices do not factor into "
                         f"(batch, {n_spatial}) spatial groups")
    arr = np.asarray(devices).reshape(n // n_spatial, n_spatial)
    return Mesh(arr, (batch_axis, spatial_axis))


def spatial_image_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding for NHWC image tensors: batch over 'data', H over 'space'."""
    batch_axis, spatial_axis = mesh.axis_names
    spec = [None] * ndim
    spec[0] = batch_axis
    spec[1] = spatial_axis
    return NamedSharding(mesh, P(*spec))


def shard_images_spatial(mesh: Mesh, *images):
    """Device-put NHWC images with H split over the mesh's spatial axis."""
    out = tuple(
        jax.device_put(np.asarray(im), spatial_image_sharding(mesh, im.ndim))
        for im in images
    )
    return out[0] if len(out) == 1 else out


def spatial_apply(fn):
    """Wrap a model-apply callable for spatial-mesh execution.

    Forces the XLA cost-volume path at trace time (the Pallas kernel is an
    opaque custom call GSPMD cannot partition) and restores the previous
    gate afterwards. The returned callable is jit-compatible; shard the
    image arguments with :func:`shard_images_spatial` and GSPMD partitions
    the whole program.
    """

    def wrapped(*args, **kwargs):
        prev = os.environ.get("ARFLOW_USE_PALLAS")
        os.environ["ARFLOW_USE_PALLAS"] = "0"
        try:
            return fn(*args, **kwargs)
        finally:
            if prev is None:
                os.environ.pop("ARFLOW_USE_PALLAS", None)
            else:
                os.environ["ARFLOW_USE_PALLAS"] = prev

    return wrapped
