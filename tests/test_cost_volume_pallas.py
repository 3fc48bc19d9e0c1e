"""Pallas cost-volume kernel: parity (fwd + grads) vs the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.ops.cost_volume import compute_cost_volume_reference
from arflow_tpu.ops.pallas.cost_volume_pallas import cost_volume_pallas, supported


@pytest.mark.parametrize("shape,md", [((2, 12, 16, 8), 4), ((1, 24, 20, 16), 2)])
def test_pallas_cost_volume_forward(rng, shape, md):
    assert supported(shape, md)
    f1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    f2 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ours = jax.jit(lambda a, b: cost_volume_pallas(a, b, md))(f1, f2)
    ref = compute_cost_volume_reference(f1, f2, md)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pallas_cost_volume_grads(rng):
    shape, md = (1, 10, 12, 8), 3
    f1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    f2 = jnp.asarray(rng.randn(*shape).astype(np.float32))

    def loss_pallas(a, b):
        return jnp.sum(cost_volume_pallas(a, b, md) ** 2)

    def loss_ref(a, b):
        return jnp.sum(compute_cost_volume_reference(a, b, md) ** 2)

    g_ours = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(f1, f2)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(f1, f2)
    np.testing.assert_allclose(np.asarray(g_ours[0]), np.asarray(g_ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ours[1]), np.asarray(g_ref[1]), atol=1e-4)


@pytest.mark.parametrize("shape,md", [((2, 12, 16, 8), 4), ((1, 24, 20, 16), 2)])
def test_pallas_cost_volume_v2_forward(rng, shape, md):
    from arflow_tpu.ops.pallas.cost_volume_pallas import (
        cost_volume_pallas_v2,
        supported_v2,
    )

    assert supported_v2(shape, md)
    f1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    f2 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ours = jax.jit(lambda a, b: cost_volume_pallas_v2(a, b, md))(f1, f2)
    ref = compute_cost_volume_reference(f1, f2, md)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pallas_cost_volume_v2_grads(rng):
    from arflow_tpu.ops.pallas.cost_volume_pallas import cost_volume_pallas_v2

    shape, md = (1, 10, 12, 8), 3
    f1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    f2 = jnp.asarray(rng.randn(*shape).astype(np.float32))

    def loss_v2(a, b):
        return jnp.sum(cost_volume_pallas_v2(a, b, md) ** 2)

    def loss_ref(a, b):
        return jnp.sum(compute_cost_volume_reference(a, b, md) ** 2)

    g_ours = jax.jit(jax.grad(loss_v2, argnums=(0, 1)))(f1, f2)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(f1, f2)
    np.testing.assert_allclose(np.asarray(g_ours[0]), np.asarray(g_ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ours[1]), np.asarray(g_ref[1]), atol=1e-4)
