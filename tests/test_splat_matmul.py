"""One-hot-matmul bilinear splat == scatter-add splat (fwd and grad).

The range-map splat runs as an MXU einsum — chunked over source pixels
above a factor-matrix memory budget — for target grids up to
``_MATMUL_SPLAT_MAX_TARGET`` pixels, with a dense scatter-add beyond
(arflow_tpu/ops/occlusion.py). Torch parity is covered by
test_ops_parity.py (which exercises the matmul path at its shapes); here
the formulations are pinned against each other, including gradients,
chunked accumulation, and out-of-range / exactly-integer coordinates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.ops import occlusion


def _coords(rng, b, h, w, spread):
    y = rng.uniform(-spread, h + spread, size=(b, h, w)).astype(np.float32)
    x = rng.uniform(-spread, w + spread, size=(b, h, w)).astype(np.float32)
    # Include exactly-integer coordinates (floor==value corner cases).
    y[:, 0, :] = np.round(y[:, 0, :])
    x[:, :, 0] = np.round(x[:, :, 0])
    return jnp.asarray(x), jnp.asarray(y)


@pytest.mark.parametrize("spread", [0.0, 3.0, 40.0])
def test_matmul_matches_scatter(rng, spread):
    b, h, w = 3, 12, 20
    x, y = _coords(rng, b, h, w, spread)

    got = jax.jit(
        lambda x, y: occlusion._matmul_bilinear(x, y, h, w)
    )(x, y)
    want = jax.jit(
        lambda x, y: occlusion._scatter_add_bilinear(x, y, h, w)
    )(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chunked_matmul_matches_unchunked(rng, monkeypatch):
    b, h, w = 2, 16, 24
    x, y = _coords(rng, b, h, w, 5.0)
    want = jax.jit(
        lambda x, y: occlusion._matmul_bilinear(x, y, h, w)
    )(x, y)
    # Shrink the budget so the same call goes through the lax.scan
    # source-chunked path (with a ragged final chunk).
    monkeypatch.setattr(occlusion, "_MATMUL_SPLAT_BUDGET", 0)
    got = jax.jit(
        lambda x, y: occlusion._matmul_bilinear(x, y, h, w)
    )(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_matmul_splat_gradients_match(rng):
    b, h, w = 2, 10, 14
    x, y = _coords(rng, b, h, w, 2.0)
    # Keep coords off exact integers: the splat weight is non-differentiable
    # there and the two formulations may pick different subgradients.
    x = x + 0.3
    y = y + 0.3

    def loss(fn, x, y):
        return jnp.sum(jnp.tanh(fn(x, y, h, w)))

    g_mm = jax.jit(jax.grad(
        lambda x, y: loss(occlusion._matmul_bilinear, x, y), argnums=(0, 1)
    ))(x, y)
    g_sc = jax.jit(jax.grad(
        lambda x, y: loss(occlusion._scatter_add_bilinear, x, y),
        argnums=(0, 1),
    ))(x, y)
    for a, b_ in zip(g_mm, g_sc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_dispatch_by_target_size(rng, monkeypatch):
    b, h, w = 2, 8, 8
    x, y = _coords(rng, b, h, w, 1.0)
    calls = []
    real = occlusion._matmul_bilinear
    monkeypatch.setattr(
        occlusion, "_matmul_bilinear",
        lambda *a: calls.append(1) or real(*a),
    )
    # The matmul path (and its size threshold) is TPU-measured; other
    # backends keep the scatter path (advisor round 2).
    monkeypatch.setattr(occlusion.jax, "default_backend", lambda: "tpu")
    occlusion._scatter_bilinear(x, y, h, w)
    assert calls  # small target on TPU -> matmul path
    calls.clear()
    monkeypatch.setattr(occlusion, "_MATMUL_SPLAT_MAX_TARGET", 0)
    occlusion._scatter_bilinear(x, y, h, w)
    assert not calls  # huge target -> dense scatter path
    calls.clear()
    monkeypatch.setattr(occlusion, "_MATMUL_SPLAT_MAX_TARGET", 600_000)
    monkeypatch.setattr(occlusion.jax, "default_backend", lambda: "cpu")
    occlusion._scatter_bilinear(x, y, h, w)
    assert not calls  # non-TPU backend -> scatter path


def test_matmul_splat_bf16_coords_exact(rng):
    # bf16 coords would silently drop one-hot taps (integers > 256 are
    # unrepresentable); the splat must promote internally to f32 and
    # return the caller's dtype (advisor round 2).
    b, h, w = 2, 12, 300
    x, y = _coords(rng, b, h, w, 0.0)
    got = occlusion._matmul_bilinear(
        x.astype(jnp.bfloat16), y.astype(jnp.bfloat16), h, w
    )
    assert got.dtype == jnp.bfloat16
    want = occlusion._matmul_bilinear(
        x.astype(jnp.bfloat16).astype(jnp.float32),
        y.astype(jnp.bfloat16).astype(jnp.float32),
        h,
        w,
    )
    # atol = one bf16 ulp at the largest count (the OUTPUT cast rounds).
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want), atol=0.05
    )
    # The f32 promotion must preserve exactly-integer taps beyond bf16's
    # integer range (x > 256): every splatted column keeps its mass.
    col_mass = np.asarray(jnp.sum(want.reshape(b, h, w), axis=(0, 1)))
    assert col_mass[256:].sum() > 0.0  # taps beyond bf16 integer range exist
