"""Supervised MSE loss vs the reference oracle (losses/mse_loss.py:60-148).

Diag parametrizations run against the live torch reference with the same
cuda-patch + injected-noise treatment the ELBO parity test uses. The
reference's non-diag branches are dead code there (its triag import is
commented out, losses/mse_loss.py:5), so the banded paths are pinned by
consistency tests against the diag path + the documented band conventions
(our banded ops themselves have dense-matrix parity tests in test_triag*).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.losses import MseLoss
from tests.reference_oracle import import_reference

B, H, W = 2, 12, 16


def nchw(x):
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


class StubNormal:
    def __init__(self, draws):
        self.draws = list(draws)

    def sample(self, size):
        d = self.draws.pop(0)
        assert tuple(size) == tuple(d.shape), (size, d.shape)
        return torch.tensor(d)


def base_cfg(**over):
    cfg = {
        "type": "mse",
        "w_mse": 1.0,
        "w_entropy": 0.1,
        "diag": True,
        "diag_dominant": False,
        "inv_cov": False,
        "approx_entropy": False,
        "offdiag_reg": 1000.0,
        "n_samples": 2,
        "align_corners": False,
    }
    cfg.update(over)
    return Config(cfg)


@pytest.mark.parametrize("inv_cov", [False, True])
def test_mse_diag_parity(rng, inv_cov):
    cfg = base_cfg(inv_cov=inv_cov)
    out2 = rng.randn(B, H, W, 4).astype(np.float32) * 0.5
    gt = (rng.randn(B, 2 * H, 2 * W, 2) * 3).astype(np.float32)
    eps = rng.randn(cfg.n_samples * B, H, W, 2).astype(np.float32)

    ours = jax.jit(lambda o, g, nz: MseLoss(cfg)([None, None, o], g, noise=nz))(
        jnp.asarray(out2), jnp.asarray(gt), {"eps": jnp.asarray(eps)}
    )

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        mse_ref = import_reference("losses.mse_loss")
        ref_loss = mse_ref.MseLoss(cfg)
        ref_loss.Normal = StubNormal([np.transpose(eps, (0, 3, 1, 2))])
        output = [None, None, nchw(out2)]
        total, l_mse, l_ent, l_off = ref_loss(output, nchw(gt))
    finally:
        torch.Tensor.cuda = orig_cuda

    np.testing.assert_allclose(
        float(ours["l_mse"]), float(l_mse), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(ours["entropy"]), float(l_ent), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(ours["total"]), float(total), rtol=2e-5, atol=1e-6
    )
    assert float(ours["l_offdiag"]) == 0.0 == float(l_off)


def test_mse_nondiag_zero_bands_match_diag(rng):
    """With zero off-diag bands the triangular paths must equal diag ones,
    and the offdiag regularizer must follow its closed form."""
    out8 = rng.randn(B, H, W, 8).astype(np.float32) * 0.5
    out8_zero = out8.copy()
    out8_zero[..., 4:8] = 0.0
    gt = (rng.randn(B, H, W, 2) * 3).astype(np.float32)
    eps = rng.randn(2 * B, H, W, 2).astype(np.float32)
    noise = {"eps": jnp.asarray(eps)}

    for inv_cov in (False, True):
        diag_out = MseLoss(base_cfg(inv_cov=inv_cov))(
            [None, None, jnp.asarray(out8_zero[..., :4])], jnp.asarray(gt),
            noise=noise,
        )
        tri_out = MseLoss(base_cfg(diag=False, inv_cov=inv_cov))(
            [None, None, jnp.asarray(out8_zero)], jnp.asarray(gt), noise=noise
        )
        np.testing.assert_allclose(
            float(tri_out["l_mse"]), float(diag_out["l_mse"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(tri_out["entropy"]), float(diag_out["entropy"]), rtol=1e-5
        )
        assert float(tri_out["l_offdiag"]) == 0.0

    # offdiag regularizer closed form on real bands
    tri = MseLoss(base_cfg(diag=False))(
        [None, None, jnp.asarray(out8)], jnp.asarray(gt), noise=noise
    )
    left = out8[..., 4:6][:, :, :-1, :]
    over = out8[..., 6:8][:, :-1, :, :]
    expect = 1000.0 * (np.mean(left ** 2) + np.mean(over ** 2)) / 2.0
    np.testing.assert_allclose(float(tri["l_offdiag"]), expect, rtol=1e-5)


def test_mse_diag_dominant_and_approx_entropy(rng):
    """diag_dominant inflates the diagonal; approx_entropy (inv_cov, nondiag)
    yields the quadratic-form entropy, matching its formula."""
    out8 = rng.randn(B, H, W, 8).astype(np.float32) * 0.3
    gt = np.zeros((B, H, W, 2), np.float32)
    eps = rng.randn(B, H, W, 2).astype(np.float32)
    noise = {"eps": jnp.asarray(eps)}

    plain = MseLoss(base_cfg(diag=False, inv_cov=True, n_samples=1))(
        [None, None, jnp.asarray(out8)], jnp.asarray(gt), noise=noise
    )
    dom = MseLoss(
        base_cfg(diag=False, inv_cov=True, diag_dominant=True, n_samples=1)
    )([None, None, jnp.asarray(out8)], jnp.asarray(gt), noise=noise)
    # inv_cov: larger diagonal -> smaller samples; same entropy term
    assert float(dom["entropy"]) == float(plain["entropy"])
    assert float(dom["l_mse"]) != float(plain["l_mse"])

    approx = MseLoss(
        base_cfg(
            diag=False, inv_cov=True, approx_entropy=True, n_samples=1
        )
    )([None, None, jnp.asarray(out8)], jnp.asarray(gt), noise=noise)
    assert float(approx["entropy"]) != float(plain["entropy"])
    assert np.isfinite(float(approx["total"]))


def test_mse_grad_finite(rng):
    out8 = rng.randn(B, H, W, 8).astype(np.float32) * 0.3
    gt = (rng.randn(B, H, W, 2)).astype(np.float32)

    for cfg in (
        base_cfg(),
        base_cfg(inv_cov=True),
        base_cfg(diag=False),
        base_cfg(diag=False, inv_cov=True),
        base_cfg(diag=False, inv_cov=True, approx_entropy=True),
    ):
        def f(o):
            return MseLoss(cfg)(
                [None, None, o], jnp.asarray(gt),
                rng=jax.random.PRNGKey(0),
            )["total"]

        g = jax.grad(f)(jnp.asarray(out8))
        assert np.isfinite(np.asarray(g)).all(), cfg
