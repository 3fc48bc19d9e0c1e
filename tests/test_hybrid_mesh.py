"""Multi-host (DCN×ICI) mesh construction + end-to-end sharded step.

SURVEY §2.3's stretch item: the reference scales only via single-process
DataParallel (trainer/base_trainer.py:75); here the DCN dimension is a
first-class mesh axis. No real multi-host fabric exists on this host, so
these tests pin the construction logic (host-major factoring, divisibility,
degenerate single-host case) and run a REAL sharded train step over the
2-D hybrid mesh on the virtual 8-device CPU backend — proving the
P(("dcn","data")) batch sharding compiles and matches the 1-D mesh
numerically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from arflow_tpu.parallel import (
    batch_sharding,
    dp_axes,
    make_hybrid_mesh,
    make_mesh,
    shard_batch,
)


def test_hybrid_mesh_shape_and_axes():
    devs = jax.devices()
    mesh = make_hybrid_mesh(devs, n_hosts=2)
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, len(devs) // 2)
    assert dp_axes(mesh) == ("dcn", "data")
    # host-major order preserved: flattening recovers all devices once
    assert sorted(d.id for d in mesh.devices.flat) == sorted(
        d.id for d in devs
    )


def test_hybrid_mesh_single_host_degenerate():
    mesh = make_hybrid_mesh(jax.devices(), n_hosts=1)
    assert mesh.devices.shape == (1, len(jax.devices()))


def test_hybrid_mesh_divisibility_error():
    devs = jax.devices()
    with pytest.raises(ValueError, match="do not split"):
        make_hybrid_mesh(devs[:6], n_hosts=4)
    with pytest.raises(ValueError, match="do not split"):
        make_hybrid_mesh(devs, n_hosts=0)


def test_batch_sharding_spans_both_axes():
    mesh = make_hybrid_mesh(jax.devices(), n_hosts=2)
    sh = batch_sharding(mesh, ndim=4)
    assert sh.spec == P(("dcn", "data"), None, None, None)
    # every device holds batch/8 rows: fully data-parallel over the grid
    x = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    arr = shard_batch(mesh, {"x": x})["x"]
    assert arr.sharding.num_devices == len(jax.devices())
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(1, 4, 4, 3)}


def test_sharded_step_matches_1d_mesh():
    """A jitted grad step over the hybrid mesh == the 1-D mesh result.

    The hierarchical (ICI-then-DCN) reduction must be numerically the same
    reduction; params stay replicated, batch rides both axes.
    """
    rng = np.random.RandomState(0)
    x = rng.rand(8, 16).astype(np.float32)
    w = rng.rand(16, 4).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    results = []
    for mesh in (make_mesh(), make_hybrid_mesh(n_hosts=2),
                 make_hybrid_mesh(n_hosts=4)):
        wd = jax.device_put(w, NamedSharding(mesh, P()))
        xd = shard_batch(mesh, {"x": x})["x"]
        g = jax.jit(jax.grad(loss))(wd, xd)
        # gradient comes back fully replicated (psum over both axes)
        assert g.sharding.is_fully_replicated
        results.append(np.asarray(g))
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    np.testing.assert_allclose(results[0], results[2], rtol=1e-6)
