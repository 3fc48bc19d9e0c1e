"""Subpixel decomposition of the 4x4/s2/p1 transposed conv: exact parity.

``ARFLOW_DECONV_SUBPIX=1`` computes the context up-convs
(ConvTranspose2dTorch, the reference's context_up deconvs,
uflow_model.py) as ONE (2,2,C,4*F) VALID conv + 4-phase interleave
instead of the lhs-dilated direct form (which multiplies 12 of the 16
kernel taps against structural zeros). Each output pixel is the SAME 4
multiply-adds either way, so parity is exact to f32 dot-order noise.
These tests pin layer forward + parameter gradients and the model-level
gate, subpixel vs direct. (The gate defaults OFF everywhere: the isolated
layer wins 1.6-2.3x but end-to-end the direct form's fusion into the
decoder concat wins — bidir.deconv_subpixel_enabled has the A/B.)
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.models.layers import ConvTranspose2dTorch
from arflow_tpu.models.uflow import PWCFlow


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 7, 9, 5), 5, 4),
    ((1, 16, 24, 32), 32, 32),
])
def test_layer_forward_parity(shape, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    layer = ConvTranspose2dTorch(cout, kernel_size=4, stride=2, padding=1)
    variables = layer.init(jax.random.PRNGKey(0), x)
    # nonzero bias so the bias path is covered too
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 if v.ndim == 1 else v, variables)

    direct = layer.apply(variables, x)
    sub = layer.apply(variables, x, subpixel=True)
    assert direct.shape == sub.shape == (
        shape[0], 2 * shape[1], 2 * shape[2], cout)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(sub),
                               rtol=0, atol=2e-6)


def test_layer_grad_parity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 12, 6).astype(np.float32))
    layer = ConvTranspose2dTorch(8, kernel_size=4, stride=2, padding=1)
    variables = layer.init(jax.random.PRNGKey(0), x)
    cot = jnp.asarray(rng.randn(2, 16, 24, 8).astype(np.float32))

    def loss(v, sub):
        return jnp.sum(layer.apply(v, x, subpixel=sub) * cot)

    g_direct = jax.grad(loss)(variables, False)
    g_sub = jax.grad(loss)(variables, True)
    flat_d = jax.tree_util.tree_leaves(g_direct)
    flat_s = jax.tree_util.tree_leaves(g_sub)
    for a, b in zip(flat_d, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)


def _model_forward(params, img1, img2, gate):
    os.environ["ARFLOW_DECONV_SUBPIX"] = gate
    try:
        model = PWCFlow(level_dropout=0.0, feature_norm=True)

        @jax.jit
        def run(p, a, b):
            return model.apply({"params": p}, a, b, with_bk=False)

        return jax.device_get(run(params, img1, img2))
    finally:
        os.environ.pop("ARFLOW_DECONV_SUBPIX", None)


def test_model_gate_parity():
    rng = np.random.RandomState(2)
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    params = model.init(jax.random.PRNGKey(0), img1, img2,
                        with_bk=False)["params"]
    off = _model_forward(params, img1, img2, "0")
    on = _model_forward(params, img1, img2, "1")
    for a, b in zip(off["flows_fw"], on["flows_fw"]):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)
