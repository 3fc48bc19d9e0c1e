"""Tests for the wavefront triangular-solve ops.

Oracles:
- reference python loop solvers (utils/triag_solve.py:76-115),
- reference banded products (utils/triag_solve.py:18-73),
- torch autograd through the reference loop (validates our custom VJPs,
  which implement utils/triag_solve.py:163-202),
- jtu.check_grads (numerical), mirroring the reference's gradcheck
  self-test (utils/triag_solve.py:401-415).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from jax._src import test_util as jtu  # check_grads (jax.test_util was removed)

from tests.reference_oracle import import_reference
from arflow_tpu.ops import triag

triag_ref = import_reference("utils.triag_solve")

K, C, M, N = 2, 2, 5, 6


def make_system(rng, m=M, n=N):
    a = 2.0 + rng.rand(K, C, m, n).astype(np.float64)
    b = rng.randn(K, C, m, n - 1).astype(np.float64)
    c = rng.randn(K, C, m - 1, n).astype(np.float64)
    d = rng.randn(K, C, m - 1, n - 1).astype(np.float64)
    x = rng.randn(K, C, m, n).astype(np.float64)
    return a, b, c, d, x


def to_nhwc(t):
    return jnp.asarray(np.transpose(t, (0, 2, 3, 1)))


def from_nhwc(t):
    return np.transpose(np.asarray(t), (0, 3, 1, 2))


def test_matrix_vector_product(rng):
    a, b, c, d, x = make_system(rng)
    ours = from_nhwc(
        triag.matrix_vector_product(
            to_nhwc(a), to_nhwc(b), to_nhwc(c), to_nhwc(d), to_nhwc(x)
        )
    )
    theirs = triag_ref.matrix_vector_product(
        *(torch.from_numpy(t) for t in (a, b, c, d, x))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_matrix_vector_product_T(rng):
    a, b, c, d, x = make_system(rng)
    ours = from_nhwc(
        triag.matrix_vector_product_T(
            to_nhwc(a), to_nhwc(b), to_nhwc(c), to_nhwc(d), to_nhwc(x)
        )
    )
    theirs = triag_ref.matrix_vector_product_T(
        *(torch.from_numpy(t) for t in (a, b, c, d, x))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


@pytest.mark.parametrize("k", [1, 2])
def test_matrix_vector_product_general(rng, k):
    nb = (k + 1) ** 2
    a = rng.randn(K, 2 * nb, M, N).astype(np.float64)
    x = rng.randn(K, 2, M, N).astype(np.float64)
    ours = from_nhwc(
        triag.matrix_vector_product_general(to_nhwc(a), to_nhwc(x), k=k)
    )
    theirs = triag_ref.matrix_vector_product_general(
        torch.from_numpy(a), torch.from_numpy(x), k=k
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)

    ours_t = from_nhwc(
        triag.matrix_vector_product_T_general(to_nhwc(a), to_nhwc(x), k=k)
    )
    theirs_t = triag_ref.matrix_vector_product_T_general(
        torch.from_numpy(a), torch.from_numpy(x), k=k
    ).numpy()
    np.testing.assert_allclose(ours_t, theirs_t, atol=1e-12)


@pytest.mark.parametrize("m,n", [(5, 6), (6, 5), (1, 4), (4, 1), (7, 7)])
def test_forward_substitution(rng, m, n):
    a, b, c, d, x = make_system(rng, m, n)
    ours = from_nhwc(
        triag.forward_substitution(
            to_nhwc(a), to_nhwc(b), to_nhwc(c), to_nhwc(d), to_nhwc(x)
        )
    )
    theirs = triag_ref.forward_substitution(
        *(torch.from_numpy(t) for t in (a, b, c, d, x))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
    # Residual check: L y = x
    res = from_nhwc(
        triag.matrix_vector_product(
            to_nhwc(a), to_nhwc(b), to_nhwc(c), to_nhwc(d), to_nhwc(ours)
        )
    )
    np.testing.assert_allclose(res, x, atol=1e-9)


@pytest.mark.parametrize("m,n", [(5, 6), (6, 5), (7, 7)])
def test_backward_substitution(rng, m, n):
    a, b, c, d, x = make_system(rng, m, n)
    ours = from_nhwc(
        triag.backward_substitution(
            to_nhwc(a), to_nhwc(b), to_nhwc(c), to_nhwc(d), to_nhwc(x)
        )
    )
    theirs = triag_ref.backward_substitution(
        *(torch.from_numpy(t) for t in (a, b, c, d, x))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_forward_substitution_custom_vjp_vs_autodiff(rng):
    # The analytic custom VJP (utils/triag_solve.py:171-181) must match JAX
    # autodiff through the raw scan implementation.
    a, b, c, d, x = make_system(rng)
    args = (to_nhwc(a), to_nhwc(b), to_nhwc(c), to_nhwc(d), to_nhwc(x))

    def loss_custom(*args_):
        return jnp.sum(triag.forward_substitution(*args_) ** 3)

    def loss_raw(*args_):
        return jnp.sum(triag._forward_substitution_impl(*args_) ** 3)

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4))(*args)
    g_raw = jax.grad(loss_raw, argnums=(0, 1, 2, 3, 4))(*args)
    for gc, gr in zip(g_custom, g_raw):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), atol=1e-9)


def test_forward_substitution_grads_numerical(rng):
    a, b, c, d, x = make_system(rng)
    args = (to_nhwc(a), to_nhwc(b), to_nhwc(c), to_nhwc(d), to_nhwc(x))
    jtu.check_grads(
        triag.forward_substitution, args, order=1, modes=["rev"], atol=1e-3, rtol=1e-3
    )


def test_backward_substitution_grads_numerical(rng):
    a, b, c, d, x = make_system(rng)
    args = (to_nhwc(a), to_nhwc(b), to_nhwc(c), to_nhwc(d), to_nhwc(x))
    jtu.check_grads(
        triag.backward_substitution, args, order=1, modes=["rev"], atol=1e-3, rtol=1e-3
    )


def test_inverse_diagonal(rng):
    # Oracle: reference marginal_variances (utils/triag_solve.py:205-218)
    # patched to use the python solver (the CUDA call is commented there).
    m, n = 4, 5
    a = 2.0 + rng.rand(1, 1, m, n).astype(np.float64)
    b = rng.randn(1, 1, m, n - 1).astype(np.float64)
    c = rng.randn(1, 1, m - 1, n).astype(np.float64)

    ours = from_nhwc(
        triag.inverse_diagonal(to_nhwc(a), to_nhwc(b), to_nhwc(c), chunk=4)
    )

    # Dense numpy oracle.
    at, bt, ct = a[0, 0], b[0, 0], c[0, 0]
    l_mat = triag_ref.ABC_matrix_np(at, bt, ct)
    inv = np.linalg.inv(l_mat @ l_mat.T)
    np.testing.assert_allclose(ours[0, 0].ravel(), np.diag(inv), atol=1e-9)
