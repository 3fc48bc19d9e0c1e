"""data_loss_no_penalty_bidir == two sequential data_loss_no_penalty calls.

The ELBO oracle-parity tests (test_losses_parity.py) pin the bidir path for
occ_type='sample'; here the batched fast path is checked against the
sequential helper for every occ_type and data-loss combination.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.losses.blocks import (
    data_loss_no_penalty,
    data_loss_no_penalty_bidir,
)

B, H2, W2 = 2, 12, 16
H, W = H2 * 4, W2 * 4


@pytest.mark.parametrize("occ_type", ["mean", "sample", "none"])
@pytest.mark.parametrize("data_loss", [["census"], ["ssim"], ["census", "ssim"]])
def test_bidir_matches_sequential(rng, occ_type, data_loss):
    im1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    f12 = jnp.asarray((rng.randn(B, H2, W2, 2) * 1.5).astype(np.float32))
    f21 = jnp.asarray((rng.randn(B, H2, W2, 2) * 1.5).astype(np.float32))
    m12 = jnp.asarray((rng.randn(B, H2, W2, 2) * 1.5).astype(np.float32))
    m21 = jnp.asarray((rng.randn(B, H2, W2, 2) * 1.5).astype(np.float32))

    pl_fw, pw_fw, occ_fw, valid_fw = jax.jit(
        lambda *a: data_loss_no_penalty(*a, occ_type, data_loss, m12, m21)
    )(im1, im2, f12, f21)
    pl_bw, pw_bw, occ_bw, _ = jax.jit(
        lambda *a: data_loss_no_penalty(*a, occ_type, data_loss, m21, m12)
    )(im2, im1, f21, f12)

    pl_b, pw_b, occ_b, valid_b = jax.jit(
        lambda *a: data_loss_no_penalty_bidir(*a, occ_type, data_loss, m12, m21)
    )(im1, im2, f12, f21)

    for i in range(len(data_loss)):
        seq_l = [pl_fw[i], pl_bw[i]]
        seq_w = [pw_fw[i], pw_bw[i]]
        got_l = pl_b[i]
        got_w = pw_b[i]
        if isinstance(seq_l[0], (list, tuple)):  # ssim returns [d1, d2]
            for j in range(len(seq_l[0])):
                np.testing.assert_allclose(
                    np.asarray(got_l[j]),
                    np.concatenate([seq_l[0][j], seq_l[1][j]], axis=0),
                    atol=1e-6,
                )
        else:
            np.testing.assert_allclose(
                np.asarray(got_l),
                np.concatenate(seq_l, axis=0),
                atol=1e-6,
            )
        np.testing.assert_allclose(
            np.asarray(got_w),
            np.concatenate(seq_w, axis=0),
            atol=1e-6,
        )

    if occ_type == "none":
        assert occ_b is None and occ_fw is None
    else:
        np.testing.assert_allclose(
            np.asarray(occ_b),
            np.concatenate([occ_fw, occ_bw], axis=0),
            atol=1e-6,
        )
    np.testing.assert_allclose(
        np.asarray(valid_b[:B]), np.asarray(valid_fw), atol=1e-6
    )


@pytest.mark.parametrize("occ_type", ["mean", "sample", "none"])
@pytest.mark.parametrize("data_loss", [["census"], ["census", "ssim"]])
def test_sample_aware_matches_pretiled(rng, occ_type, data_loss):
    """n_rep mode (un-tiled images/means) == pre-tiling everything."""
    n = 3
    im1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    m12 = jnp.asarray((rng.randn(B, H2, W2, 2) * 1.5).astype(np.float32))
    m21 = jnp.asarray((rng.randn(B, H2, W2, 2) * 1.5).astype(np.float32))
    # Sampled flows: n_rep MC samples, sample-major tiling.
    f12 = jnp.asarray((rng.randn(n * B, H2, W2, 2) * 1.5).astype(np.float32))
    f21 = jnp.asarray((rng.randn(n * B, H2, W2, 2) * 1.5).astype(np.float32))

    tile = lambda x: jnp.tile(x, (n,) + (1,) * (x.ndim - 1))

    pl_t, pw_t, occ_t, valid_t = jax.jit(
        lambda *a: data_loss_no_penalty_bidir(
            *a, occ_type, data_loss, tile(m12), tile(m21)
        )
    )(tile(im1), tile(im2), f12, f21)

    pl_s, pw_s, occ_s, valid_s = jax.jit(
        lambda *a: data_loss_no_penalty_bidir(
            *a, occ_type, data_loss, m12, m21, n_rep=n
        )
    )(im1, im2, f12, f21)

    flat = lambda t: jax.tree_util.tree_leaves(t)
    for a, b in zip(flat((pl_t, pw_t)), flat((pl_s, pw_s))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    if occ_type == "none":
        assert occ_t is None and occ_s is None
    else:
        np.testing.assert_allclose(
            np.asarray(occ_t), np.asarray(occ_s), atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(valid_t), np.asarray(valid_s), atol=1e-5
    )
