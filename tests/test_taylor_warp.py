"""Taylor-warp ELBO fast path (opt-in, documented divergence).

- ``resample_with_grads`` returns the EXACT within-cell partials of the
  bilinear interpolant (checked against jax.jacfwd of ``resample`` wrt the
  warp coordinates).
- With the gate ON, the MC-sample reconstructions converge to the exact
  per-sample warps as the sample perturbation shrinks (first-order path;
  exact once mean and sample share a 2x2 cell).
- With the gate OFF (default), ``data_loss_no_penalty_bidir`` is
  bit-identical to the exact path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.losses.blocks import data_loss_no_penalty_bidir
from arflow_tpu.ops import flow_to_warp, resample, resample_with_grads

B, H, W = 2, 32, 40


@pytest.fixture
def im(rng):
    return jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))


def test_resample_with_grads_matches_autodiff(rng, im):
    # Non-integer coords strictly inside the image so every query is in a
    # cell interior (the interpolant is differentiable there).
    coords = jnp.asarray(
        (rng.rand(B, H, W, 2) * [W - 2, H - 2] + 0.3).astype(np.float32)
    )
    val, gx, gy = jax.jit(resample_with_grads)(im, coords)
    np.testing.assert_allclose(
        np.asarray(val), np.asarray(resample(im, coords)), atol=1e-6
    )

    # Directional-derivative check at a handful of points via jvp.
    def sample_xy(x, y, b):
        c = jnp.stack([x, y], axis=-1)[None, None, None, :]
        c = jnp.broadcast_to(c, (1, 1, 1, 2))
        return resample(im[b : b + 1], c)[0, 0, 0]

    pts = [(0, 3.4, 5.7), (1, 10.2, 20.9), (0, 31.8, 7.1)]
    for b, x, y in pts:
        gx_ad = jax.jacfwd(sample_xy, argnums=0)(
            jnp.float32(x), jnp.float32(y), b
        )
        gy_ad = jax.jacfwd(sample_xy, argnums=1)(
            jnp.float32(x), jnp.float32(y), b
        )
        c = jnp.asarray([[[[x, y]]]], dtype=jnp.float32)
        _, gxs, gys = resample_with_grads(im[b : b + 1], c)
        np.testing.assert_allclose(np.asarray(gxs[0, 0, 0]),
                                   np.asarray(gx_ad), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gys[0, 0, 0]),
                                   np.asarray(gy_ad), atol=1e-5)


def _bidir_losses(monkeypatch, gate, im1, im2, flow12, flow21, mean12,
                  mean21, n_rep):
    if gate is None:
        monkeypatch.delenv("ARFLOW_TAYLOR_WARP", raising=False)
    else:
        monkeypatch.setenv("ARFLOW_TAYLOR_WARP", gate)
    pl, pw, occ, valid = data_loss_no_penalty_bidir(
        im1, im2, flow12, flow21, "mean", ["census"], mean12, mean21,
        n_rep=n_rep,
    )
    return jax.tree_util.tree_map(np.asarray, (pl, pw, occ, valid))


def test_gate_off_is_exact(monkeypatch, rng, im):
    im2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    h2, w2 = H // 4, W // 4
    n = 3
    mean12 = jnp.asarray(rng.randn(B, h2, w2, 2).astype(np.float32))
    mean21 = jnp.asarray(rng.randn(B, h2, w2, 2).astype(np.float32))
    flow12 = jnp.tile(mean12, (n, 1, 1, 1)) + 0.05
    flow21 = jnp.tile(mean21, (n, 1, 1, 1)) - 0.05

    default = _bidir_losses(monkeypatch, None, im, im2, flow12, flow21,
                            mean12, mean21, n)
    exact = _bidir_losses(monkeypatch, "0", im, im2, flow12, flow21,
                          mean12, mean21, n)
    for a, b in zip(jax.tree_util.tree_leaves(default),
                    jax.tree_util.tree_leaves(exact)):
        np.testing.assert_array_equal(a, b)


def _smooth_images(rng, b, h, w):
    """Band-limited test images: bilinear-upsampled low-res noise. White
    noise is the linearization's worst case (adjacent pixels are
    uncorrelated, so crossing a 2x2 cell boundary voids the first-order
    model); natural images — the operating regime — are band-limited."""
    low = rng.rand(b, h // 8, w // 8, 3).astype(np.float32)
    return jax.image.resize(jnp.asarray(low), (b, h, w, 3), "bilinear")


def test_taylor_converges_to_exact(monkeypatch, rng):
    """Loss under the Taylor path -> exact-path loss as sample noise -> 0,
    and at sub-pixel noise the two stay close (the operating regime)."""
    im1 = _smooth_images(rng, B, H, W)
    im2 = _smooth_images(rng, B, H, W)
    h2, w2 = H // 4, W // 4
    n = 4
    mean12 = jnp.asarray((rng.randn(B, h2, w2, 2) * 0.5).astype(np.float32))
    mean21 = jnp.asarray((rng.randn(B, h2, w2, 2) * 0.5).astype(np.float32))
    noise = jnp.asarray(rng.randn(n * B, h2, w2, 2).astype(np.float32))

    errs = []
    ref_scale = None
    for eps in (0.3, 0.03, 0.003):
        flow12 = jnp.tile(mean12, (n, 1, 1, 1)) + eps * noise
        flow21 = jnp.tile(mean21, (n, 1, 1, 1)) - eps * noise

        monkeypatch.setenv("ARFLOW_TAYLOR_WARP", "0")
        (pl_e,), _, _, _ = data_loss_no_penalty_bidir(
            im1, im2, flow12, flow21, "mean", ["census"], mean12, mean21,
            n_rep=n,
        )
        monkeypatch.setenv("ARFLOW_TAYLOR_WARP", "1")
        (pl_t,), _, _, _ = data_loss_no_penalty_bidir(
            im1, im2, flow12, flow21, "mean", ["census"], mean12, mean21,
            n_rep=n,
        )
        errs.append(float(jnp.mean(jnp.abs(pl_t - pl_e))))
        ref_scale = float(jnp.mean(jnp.abs(pl_e)))

    # First-order accuracy: each 10x smaller perturbation shrinks the
    # divergence >=5x (measured ~15-30x), and at sub-pixel noise the
    # relative error is well under 1% of the loss scale (measured 0.35%
    # at eps=0.03, 0.011% at 0.003).
    assert errs[1] < errs[0] * 0.2
    assert errs[2] < errs[1] * 0.2
    assert errs[1] < 0.01 * ref_scale
