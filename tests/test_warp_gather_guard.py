"""Regression guard for the TPU gather miscompile (round 2, 2026-08-16).

On the TPU backend, XLA deterministically corrupted ``bilinear_gather``'s
taps when the flat take_along_axis was fused with the 4D output reshape at
full-resolution shapes (~45% of values wrong or NaN-filled at 8x256x448).
``ops/warp.py`` now pins an ``optimization_barrier`` between the gather and
the reshape. This test compares against a pure-numpy bilinear reference at
exactly the triggering shape; it runs on whatever backend the suite uses
(CPU by default — rerun with ARFLOW_TEST_TPU=1 on hardware to re-verify).
"""

import numpy as np

import jax
import jax.numpy as jnp

from arflow_tpu.ops.warp import bilinear_gather


def np_bilinear_zeros(src, x, y):
    b, h, w, c = src.shape
    srcp = np.pad(src, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x0 = np.floor(x)
    y0 = np.floor(y)
    ix = (np.clip(x0, -1, w - 1) + 1).astype(np.int64)
    iy = (np.clip(y0, -1, h - 1) + 1).astype(np.int64)
    wx1 = (x - x0)[..., None]
    wy1 = (y - y0)[..., None]
    bi = np.arange(b)[:, None, None]
    t00 = srcp[bi, iy, ix]
    t01 = srcp[bi, iy, ix + 1]
    t10 = srcp[bi, iy + 1, ix]
    t11 = srcp[bi, iy + 1, ix + 1]
    out = (1 - wy1) * ((1 - wx1) * t00 + wx1 * t01) + wy1 * (
        (1 - wx1) * t10 + wx1 * t11
    )
    oob = ((x >= -1) & (x < w) & (y >= -1) & (y < h)).astype(np.float32)[
        ..., None
    ]
    return (out * oob).astype(np.float32)


def test_bilinear_gather_full_res_vs_numpy(rng):
    B, H, W, C = 8, 256, 448, 3  # the shape that exposed the miscompile
    src = rng.rand(B, H, W, C).astype(np.float32)
    x = (rng.rand(B, H, W) * (W + 40) - 20).astype(np.float32)
    y = (rng.rand(B, H, W) * (H + 40) - 20).astype(np.float32)
    got = np.asarray(
        jax.jit(lambda s, a, b: bilinear_gather(s, a, b, "zeros"))(
            jnp.asarray(src), jnp.asarray(x), jnp.asarray(y)
        )
    )
    ref = np_bilinear_zeros(src, x, y)
    assert not np.isnan(got).any()
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
