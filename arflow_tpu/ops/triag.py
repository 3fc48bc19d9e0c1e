"""Sparse triangular matrix ops for spatially-coupled Gaussian posteriors.

TPU-native equivalent of the reference's CUDA extension
(utils/triag_solve/triag_solve_cuda.cu:7-139) and its PyTorch wrappers
(utils/triag_solve.py). The lower-triangular matrix L over the image lattice
is banded: A (center), B (left neighbor), C (above), D (above-left).

Layout: all tensors are channels-last image tensors (B, M, N, C); the bands
have reduced spatial extents, matching the reference
(A: MxN, B: MxN-1, C: M-1xN, D: M-1xN-1).

Design (SURVEY.md §2.2): the reference runs one sequential O(MN) recurrence
per (batch, channel) thread. Here the recurrence is parallelized over
anti-diagonal wavefronts — each anti-diagonal d depends only on diagonals
d-1 and d-2, so a ``lax.scan`` over M+N-1 diagonals does vectorized
(B, C, diag-width) work per step. Inputs are pre-skewed into diagonal-major
layout with a single pad+reshape (no gathers inside the scan).

Gradients: ``forward_substitution`` / ``backward_substitution`` carry custom
VJPs implementing the analytic adjoints of utils/triag_solve.py:163-202.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Banded matrix-vector products (utils/triag_solve.py:18-73)
# ---------------------------------------------------------------------------

def _pad_nhwc(x, top=0, bottom=0, left=0, right=0):
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))


def matrix_vector_product(a, b, c, d, x):
    """y = L x with bands |D|C| / |B|A| (utils/triag_solve.py:18-26). NHWC."""
    b_y = _pad_nhwc(b * x[:, :, :-1, :], left=1)
    c_y = _pad_nhwc(c * x[:, :-1, :, :], top=1)
    d_y = _pad_nhwc(d * x[:, :-1, :-1, :], top=1, left=1)
    return a * x + b_y + c_y + d_y


def matrix_vector_product_T(a, b, c, d, x):
    """y = L^T x (utils/triag_solve.py:52-56). NHWC."""
    b_y = _pad_nhwc(b * x[:, :, 1:, :], right=1)
    c_y = _pad_nhwc(c * x[:, 1:, :, :], bottom=1)
    d_y = _pad_nhwc(d * x[:, 1:, 1:, :], bottom=1, right=1)
    return a * x + b_y + c_y + d_y


def matrix_vector_product_general(a, x, k: int = 1):
    """Generalized k-support banded product (utils/triag_solve.py:29-43).

    a: (B, M, N, 2*(k+1)**2) coefficient image, channel pairs ordered by
    band index ind = i*(k+1)+j (i = vertical offset, j = horizontal offset).
    x: (B, M, N, 2).
    """
    y = jnp.zeros_like(x)
    for i in range(k + 1):
        for j in range(k + 1):
            ind = i * (k + 1) + j
            coeff = a[..., ind * 2 : (ind + 1) * 2]
            if i > 0 and j > 0:
                y += _pad_nhwc(
                    coeff[:, :-i, :-j, :] * x[:, :-i, :-j, :], top=i, left=j
                )
            elif i > 0:
                y += _pad_nhwc(coeff[:, :-i, :, :] * x[:, :-i, :, :], top=i)
            elif j > 0:
                y += _pad_nhwc(coeff[:, :, :-j, :] * x[:, :, :-j, :], left=j)
            else:
                y += coeff * x
    return y


def matrix_vector_product_T_general(a, x, k: int = 1):
    """Transpose of the generalized product (utils/triag_solve.py:59-73)."""
    y = jnp.zeros_like(x)
    for i in range(k + 1):
        for j in range(k + 1):
            ind = i * (k + 1) + j
            coeff = a[..., ind * 2 : (ind + 1) * 2]
            if i > 0 and j > 0:
                y += _pad_nhwc(
                    coeff[:, :-i, :-j, :] * x[:, i:, j:, :], bottom=i, right=j
                )
            elif i > 0:
                y += _pad_nhwc(coeff[:, :-i, :, :] * x[:, i:, :, :], bottom=i)
            elif j > 0:
                y += _pad_nhwc(coeff[:, :, :-j, :] * x[:, :, j:, :], right=j)
            else:
                y += coeff * x
    return y


# ---------------------------------------------------------------------------
# Wavefront substitution solvers
# ---------------------------------------------------------------------------

def _skew(x: jnp.ndarray, num_diags: int) -> jnp.ndarray:
    """Diagonal-major reindex: out[..., i, d] = x[..., i, d - i] (else 0).

    x: (..., R, Cc). out: (..., R, num_diags) where num_diags >= R + Cc - 1.
    Built with one pad + reshape (out[..., i, d] reads the flattened padded
    row buffer at i*(Cc+R) + (d-i), which lands in the zero padding whenever
    d-i is outside [0, Cc)).
    """
    *lead, r, cc = x.shape
    padded = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, r)])  # (..., R, Cc+R)
    flat = padded.reshape(*lead, r * (cc + r))
    need = r * (cc + r - 1)
    skewed = flat[..., :need].reshape(*lead, r, cc + r - 1)
    if num_diags > cc + r - 1:
        skewed = jnp.pad(
            skewed, [(0, 0)] * len(lead) + [(0, 0), (0, num_diags - (cc + r - 1))]
        )
    return skewed


def _unskew(t: jnp.ndarray, r: int, cc: int) -> jnp.ndarray:
    """Inverse of _skew: out[..., i, j] = t[..., i, j + i]."""
    *lead, r_, nd = t.shape
    assert r_ == r
    flat = t.reshape(*lead, r * nd)
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, r)])
    return flat.reshape(*lead, r, nd + 1)[..., :, :cc]


def _forward_substitution_bcmn(a, b, c, d, x):
    """Solve L y = x, all args (B, C, M, N); bands per the reference layout."""
    bsz, ch, m, n = x.shape
    nd = m + n - 1

    # Skew everything to (B, C, M, nd) diagonal-major, aligned so that slice
    # [..., :, dd] holds the coefficients needed when computing diagonal dd.
    ones = jnp.ones_like(a)
    a_sk = _skew(a, nd)
    a_sk = a_sk + (1.0 - _skew(ones, nd))  # invalid lanes divide by 1
    x_sk = _skew(x, nd)

    # B couples y[i, j-1]: lives on diagonal d-1 -> prepend one diagonal.
    b_sk = _skew(b, nd - 1) if n > 1 else jnp.zeros((bsz, ch, m, nd - 1), x.dtype)
    b_sk = jnp.pad(b_sk, ((0, 0), (0, 0), (0, 0), (1, 0)))
    # C couples y[i-1, j]: coefficient C[i-1, j] -> shift rows down by one and
    # prepend one diagonal.
    c_sk = _skew(c, nd - 1) if m > 1 else jnp.zeros((bsz, ch, 0, nd - 1), x.dtype)
    c_sk = jnp.pad(c_sk, ((0, 0), (0, 0), (1, 0), (1, 0)))
    # D couples y[i-1, j-1]: shift rows down by one, prepend two diagonals.
    if m > 1 and n > 1:
        d_sk = _skew(d, nd - 2)
    else:
        d_sk = jnp.zeros((bsz, ch, max(m - 1, 0), nd - 2), x.dtype)
    d_sk = jnp.pad(d_sk, ((0, 0), (0, 0), (1, 0), (2, 0)))

    # Scan over diagonals. Carry: previous two diagonals of y, (B, C, M).
    def shift_rows(v):  # v[..., i] -> v[..., i-1]
        return jnp.pad(v[..., :-1], ((0, 0), (0, 0), (1, 0)))

    def step(carry, inp):
        prev1, prev2 = carry
        a_d, b_d, c_d, d_d, x_d = inp
        cur = (
            x_d
            - b_d * prev1
            - c_d * shift_rows(prev1)
            - d_d * shift_rows(prev2)
        ) / a_d
        return (cur, prev1), cur

    xs = (
        jnp.moveaxis(a_sk, -1, 0),
        jnp.moveaxis(b_sk, -1, 0),
        jnp.moveaxis(c_sk, -1, 0),
        jnp.moveaxis(d_sk, -1, 0),
        jnp.moveaxis(x_sk, -1, 0),
    )
    zero = jnp.zeros((bsz, ch, m), x.dtype)
    _, y_diags = lax.scan(step, (zero, zero), xs)
    y_sk = jnp.moveaxis(y_diags, 0, -1)  # (B, C, M, nd)
    return _unskew(y_sk, m, n)


def _to_bcmn(t):
    return jnp.transpose(t, (0, 3, 1, 2))


def _to_bmnc(t):
    return jnp.transpose(t, (0, 2, 3, 1))


def _flip(t):
    return t[:, ::-1, ::-1, :]


def _forward_substitution_impl(a, b, c, d, x):
    y = _forward_substitution_bcmn(
        _to_bcmn(a), _to_bcmn(b), _to_bcmn(c), _to_bcmn(d), _to_bcmn(x)
    )
    return _to_bmnc(y)


def _backward_substitution_impl(a, b, c, d, x):
    # An upper-triangular solve is a lower-triangular solve on the
    # spatially flipped lattice (both axes reversed).
    y = _forward_substitution_impl(_flip(a), _flip(b), _flip(c), _flip(d), _flip(x))
    return _flip(y)


@jax.custom_vjp
def forward_substitution(a, b, c, d, x):
    """Solve L y = x (lower-triangular banded), NHWC.

    a: (B,M,N,C) center; b: (B,M,N-1,C) left; c: (B,M-1,N,C) above;
    d: (B,M-1,N-1,C) above-left; x: (B,M,N,C).
    """
    return _forward_substitution_impl(a, b, c, d, x)


def _fwd_fwd(a, b, c, d, x):
    y = _forward_substitution_impl(a, b, c, d, x)
    return y, (a, b, c, d, y)


def _fwd_bwd(res, dy):
    # Analytic adjoint (utils/triag_solve.py:171-181).
    a, b, c, d, y = res
    dx = _backward_substitution_impl(a, b, c, d, dy)
    da = -dx * y
    db = -dx[:, :, 1:, :] * y[:, :, :-1, :]
    dc = -dx[:, 1:, :, :] * y[:, :-1, :, :]
    dd = -dx[:, 1:, 1:, :] * y[:, :-1, :-1, :]
    return da, db, dc, dd, dx


forward_substitution.defvjp(_fwd_fwd, _fwd_bwd)


@jax.custom_vjp
def backward_substitution(a, b, c, d, x):
    """Solve L^T y = x (upper-triangular banded), NHWC; band semantics as in
    utils/triag_solve.py:97-115 (B couples the right neighbor, C below)."""
    return _backward_substitution_impl(a, b, c, d, x)


def _bwd_fwd(a, b, c, d, x):
    y = _backward_substitution_impl(a, b, c, d, x)
    return y, (a, b, c, d, y)


def _bwd_bwd(res, dy):
    # Analytic adjoint (utils/triag_solve.py:192-202).
    a, b, c, d, y = res
    dx = _forward_substitution_impl(a, b, c, d, dy)
    da = -dx * y
    db = -dx[:, :, :-1, :] * y[:, :, 1:, :]
    dc = -dx[:, :-1, :, :] * y[:, 1:, :, :]
    dd = -dx[:, :-1, :-1, :] * y[:, 1:, 1:, :]
    return da, db, dc, dd, dx


backward_substitution.defvjp(_bwd_fwd, _bwd_bwd)


def inverse_diagonal(a, b, c, d=None, chunk: int = 256):
    """diag((L L^T)^{-1}) per pixel: marginal variances of N(0, (L L^T)^{-1}).

    Eval-only (uncertainty maps), mirroring triag_solve_cuda.cu:72-139 /
    utils/triag_solve.py:205-218: for each pixel p solve L y = e_p and sum
    y**2. Here the unit vectors are folded into the batch dimension and
    processed in chunks of ``chunk`` columns per solve.
    """
    bsz, m, n, ch = a.shape
    if d is None:
        d = jnp.zeros((bsz, max(m - 1, 0), max(n - 1, 0), ch), a.dtype)
    p = m * n
    num_chunks = -(-p // chunk)
    padded = num_chunks * chunk

    eye = jnp.eye(p, dtype=a.dtype)
    eye = jnp.pad(eye, ((0, padded - p), (0, 0))).reshape(num_chunks, chunk, m, n)

    def solve_chunk(_, unit):
        # unit: (chunk, M, N) -> batch of rhs for every (b, ch)
        rhs = jnp.tile(unit[None, :, :, :, None], (bsz, 1, 1, 1, ch))
        rhs = rhs.reshape(bsz * chunk, m, n, ch)
        rep = lambda t: jnp.repeat(t, chunk, axis=0)
        y = _forward_substitution_impl(rep(a), rep(b), rep(c), rep(d), rhs)
        ss = jnp.sum(y * y, axis=(1, 2))  # (bsz*chunk, ch)
        return None, ss.reshape(bsz, chunk, ch)

    _, out = lax.scan(solve_chunk, None, eye)
    out = jnp.moveaxis(out, 0, 1).reshape(bsz, padded, ch)[:, :p, :]
    return out.reshape(bsz, m, n, ch)


# ---------------------------------------------------------------------------
# Natural-gradient identities and condition estimation
# (utils/triag_solve.py:268-398; unused-but-present machinery in the
# reference, kept for capability parity)
# ---------------------------------------------------------------------------

def _pad3(x, spec):
    return jnp.pad(x, spec)


def natural_gradient(ga, gb, gc, ta, tb, tc):
    """Natural gradient wrt the 3-band triangular Cholesky factor T of a
    precision matrix, given Euclidean gradients G (utils/triag_solve.py:342-357).

    All args NHWC with bands A (B,M,N,C), B left (B,M,N-1,C), C above
    (B,M-1,N,C). Returns (q_ll, q_l1l, q_lNl) with the same band shapes.
    """
    h_ll = (
        ta * ga
        + _pad_nhwc(tb * gb, right=1)
        + _pad_nhwc(tc * gc, bottom=1)
    ) / 2.0
    h_l1l = ta[:, :, 1:, :] * gb
    h_lnl = ta[:, 1:, :, :] * gc
    h_ln1l = tb[:, 1:, :, :] * gc[:, :, 1:, :]

    q_ll = ta * h_ll
    q_l1l = ta[:, :, 1:, :] * h_l1l + tb * h_ll[:, :, :-1, :]
    q_lnl = (
        ta[:, 1:, :, :] * h_lnl
        + _pad_nhwc(tb[:, 1:, :, :] * h_ln1l, left=1)
        + tc * h_ll[:, :-1, :, :]
    )
    return q_ll, q_l1l, q_lnl


@jax.custom_vjp
def natural_gradient_identity_t(a, b, c, x):
    """Identity whose backward applies the natural-gradient transform for the
    precision parametrization (utils/triag_solve.py:359-377): the mean grad is
    solved through L then L^T; the band grads go through natural_gradient."""
    return a, b, c, x


def _ngt_fwd(a, b, c, x):
    return (a, b, c, x), (a, b, c)


def _ngt_bwd(res, grads):
    a, b, c = res
    da, db, dc, dx = grads
    zeros_d = jnp.zeros(
        (a.shape[0], max(a.shape[1] - 1, 0), max(a.shape[2] - 1, 0), a.shape[3]),
        a.dtype,
    )
    dx_n = _forward_substitution_impl(a, b, c, zeros_d, dx)
    dx_n = _backward_substitution_impl(a, b, c, zeros_d, dx_n)
    da_n, db_n, dc_n = natural_gradient(da, db, dc, a, b, c)
    return da_n, db_n, dc_n, dx_n


natural_gradient_identity_t.defvjp(_ngt_fwd, _ngt_bwd)


@jax.custom_vjp
def natural_gradient_identity_c(a, b, c, x):
    """Covariance-parametrization variant (utils/triag_solve.py:380-398):
    the mean grad goes through L^T then L (banded products, no solves)."""
    return a, b, c, x


def _ngc_fwd(a, b, c, x):
    return (a, b, c, x), (a, b, c)


def _ngc_bwd(res, grads):
    a, b, c = res
    da, db, dc, dx = grads
    zeros_d_b = jnp.zeros(
        (a.shape[0], max(a.shape[1] - 1, 0), max(a.shape[2] - 1, 0), a.shape[3]),
        a.dtype,
    )
    dx_n = matrix_vector_product_T(a, b, c, zeros_d_b, dx)
    dx_n = matrix_vector_product(a, b, c, zeros_d_b, dx_n)
    da_n, db_n, dc_n = natural_gradient(da, db, dc, a, b, c)
    return da_n, db_n, dc_n, dx_n


natural_gradient_identity_c.defvjp(_ngc_fwd, _ngc_bwd)


def inverse_l1norm(a, b, c, n_iter: int = 100):
    """Approximate ||L^{-1}||_1 via Higham's algorithm 5.1
    (utils/triag_solve.py:268-307). a: (M,N); b: (M,N-1); c: (M-1,N).

    Eval-only diagnostic (the reference used it as an exploding-posterior
    detector); implemented as a host-side loop of device solves with a
    float() sync per iteration. NEVER call inside a train step or under
    jit — it would force ``n_iter`` device round-trips per invocation.
    """
    m, n = a.shape
    a4 = a[None, :, :, None]
    b4 = b[None, :, :, None]
    c4 = c[None, :, :, None]
    d4 = jnp.zeros((1, m - 1, n - 1, 1), a.dtype)

    x = jnp.ones((m, n), a.dtype) / (m * n)
    for _ in range(n_iter):
        y = forward_substitution(a4, b4, c4, d4, x[None, :, :, None])[0, :, :, 0]
        xi = jnp.where(y < 0, -1.0, 1.0).astype(a.dtype)
        z = backward_substitution(a4, b4, c4, d4, xi[None, :, :, None])[0, :, :, 0]
        abs_z = jnp.abs(z)
        flat_idx = int(jnp.argmax(abs_z))
        if float(jnp.max(abs_z)) <= float(jnp.sum(z * x)):
            return float(jnp.sum(jnp.abs(y)))
        x = jnp.zeros((m, n), a.dtype).at[flat_idx // n, flat_idx % n].set(1.0)
    return float("inf")
