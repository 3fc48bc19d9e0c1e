"""Natural gradient + condition estimation parity vs reference numpy oracles."""

import numpy as np
import torch

import jax.numpy as jnp

from tests.reference_oracle import import_reference
from arflow_tpu.ops import triag

triag_ref = import_reference("utils.triag_solve")


def to_nhwc(t):
    return jnp.asarray(np.transpose(t, (0, 2, 3, 1)))


def from_nhwc(t):
    return np.transpose(np.asarray(t), (0, 3, 1, 2))


def test_natural_gradient_parity(rng):
    m, n = 6, 7
    ga = rng.randn(1, 1, m, n)
    gb = rng.randn(1, 1, m, n - 1)
    gc = rng.randn(1, 1, m - 1, n)
    ta = rng.randn(1, 1, m, n)
    tb = rng.randn(1, 1, m, n - 1)
    tc = rng.randn(1, 1, m - 1, n)

    q_ll, q_l1l, q_lnl = triag.natural_gradient(
        *(to_nhwc(t) for t in (ga, gb, gc, ta, tb, tc))
    )
    r_ll, r_l1l, r_lnl = triag_ref.natural_gradient(
        *(torch.from_numpy(t) for t in (ga, gb, gc, ta, tb, tc))
    )
    np.testing.assert_allclose(from_nhwc(q_ll), r_ll.numpy(), atol=1e-12)
    np.testing.assert_allclose(from_nhwc(q_l1l), r_l1l.numpy(), atol=1e-12)
    np.testing.assert_allclose(from_nhwc(q_lnl), r_lnl.numpy(), atol=1e-12)

    # Dense numpy oracle (utils/triag_solve.py:335-357 self-check logic).
    import scipy.linalg as sla

    g_mat = triag_ref.ABC_matrix_np(ga[0, 0], gb[0, 0], gc[0, 0])
    t_mat = triag_ref.ABC_matrix_np(ta[0, 0], tb[0, 0], tc[0, 0])
    q_mat = triag_ref.natural_gradient_np(g_mat, t_mat)
    np.testing.assert_allclose(
        from_nhwc(q_ll)[0, 0].ravel(), np.diag(q_mat), atol=1e-10
    )


def test_inverse_l1norm(rng):
    m, n = 8, 10
    a = np.ones((m, n))
    b = rng.randn(m, n - 1) * 0.3
    c = rng.randn(m - 1, n) * 0.3
    approx = triag.inverse_l1norm(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), n_iter=20
    )
    # Exact ||L^{-1}||_1 oracle.
    l_mat = triag_ref.ABC_matrix_np(a, b, c)
    exact = np.linalg.norm(np.linalg.inv(l_mat), ord=1)
    assert np.isfinite(approx)
    # Higham's estimate is a lower bound within a modest factor.
    assert approx <= exact * (1 + 1e-9)
    assert approx >= exact / 10.0
