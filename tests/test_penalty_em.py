"""EM penalty fitting: parity of one update vs the reference EM class."""

import numpy as np
import torch

from tests.reference_oracle import import_reference
from arflow_tpu.tools.penalty_em import EM, fwhm_scale, gaussian_mixture

ref_mod = import_reference("train_penalty_em")


def test_em_update_parity(rng):
    x0 = np.abs(rng.randn(2000)).astype(np.float64) * 2
    x1 = np.ones_like(x0)
    init_vars = [0.01, 0.1, 1.0, 10.0]

    ref = ref_mod.EM(k=4, init_vars=init_vars)
    ours = EM(k=4, init_vars=init_vars)

    xt = [torch.from_numpy(x0), torch.from_numpy(x1)]
    for _ in range(3):
        ref_obj = float(ref.update(xt))
        our_obj = ours.update(x0, x1)
        np.testing.assert_allclose(our_obj, ref_obj, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours.state.pi), ref.pi.numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours.state.beta), ref.beta.numpy(), rtol=1e-6
    )


def test_em_recovers_mixture(rng):
    # Two-scale zero-mean mixture; EM should find ~matching precisions.
    n = 20000
    comp = rng.rand(n) < 0.7
    x0 = np.where(comp, rng.randn(n) * 0.3, rng.randn(n) * 3.0)
    em = EM(k=2, init_vars=[0.05, 5.0])
    em.fit(x0, n_iter=25)
    beta = np.sort(np.asarray(em.state.beta))
    # true precisions: 1/9 and ~11.1
    assert 0.05 < beta[0] < 0.25
    assert 5.0 < beta[1] < 20.0


def test_fwhm_scale(rng):
    pi = np.array([0.7, 0.3])
    mu = np.zeros(2)
    beta = np.array([10.0, 0.1])
    scale = fwhm_scale(pi, mu, beta, reference_fwhm=1.5)
    y_half = gaussian_mixture(np.array([0.75]), pi, mu, scale * beta)
    y_peak = gaussian_mixture(np.array([0.0]), pi, mu, scale * beta)
    np.testing.assert_allclose(y_half, y_peak / 2, rtol=1e-5)
