"""Variational-EM fitting of Gaussian-mixture penalties.

Reference: train_penalty_em.py:63-346 — fits a K-component zero-mean scale
mixture (Dirichlet prior on weights, Gamma prior on precisions) to empirical
data/smoothness residuals sampled from ground-truth flow; the resulting
(pi, beta) arrays parameterize the 'gmm' penalties
(configs/chairs_uflow_elbo_gmm.json:13-19).

The EM state update is a single jitted function; sample collection reuses the
shared loss blocks (data_loss_no_penalty / smooth_loss_no_penalty).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class EMState:
    pi: jnp.ndarray
    mu: jnp.ndarray
    beta: jnp.ndarray
    alpha_bar: jnp.ndarray


class EM:
    """Variational EM for a K-component 1-D Gaussian mixture
    (train_penalty_em.py:86-220)."""

    def __init__(self, k: int = 10, init_vars=None, alpha=1.0, mu_0=0.0,
                 beta_0=1e-3, a=1.0, b=1.0):
        if init_vars is None:
            init_vars = [0.01, 0.05, 0.1, 0.25, 0.5, 1, 5, 10, 100, 1000]
        self.k = k
        self.alpha = jnp.ones(k) * alpha
        self.mu_0 = mu_0
        self.beta_0 = beta_0
        self.a = a
        self.b = b
        self.state = EMState(
            pi=jnp.ones(k) / k,
            mu=jnp.zeros(k),
            beta=1.0 / jnp.asarray(init_vars, jnp.float64),
            alpha_bar=jnp.ones(k) * alpha,
        )
        self._update = jax.jit(self._update_impl)

    def _update_impl(self, state: tuple, x0, x1):
        pi, mu, beta, alpha_bar = state
        # E-step: responsibilities xi (update_xi, :103-119).
        log_pi = jax.scipy.special.digamma(alpha_bar) - jax.scipy.special.digamma(
            jnp.sum(alpha_bar)
        )
        arg = -beta[None, :] * (x0[:, None] - mu[None, :]) ** 2 / 2 + log_pi[None, :]
        w = jnp.sqrt(beta)
        num = w[None, :] * jnp.exp(arg - jnp.max(arg, axis=1, keepdims=True))
        xi = num / jnp.sum(num, axis=1, keepdims=True)

        # M-step: pi via Dirichlet posterior (update_pi, :121-137).
        xi_sum = jnp.sum(x1[:, None] * xi, axis=0)
        alpha_bar = self.alpha + xi_sum
        pi = alpha_bar / jnp.sum(alpha_bar)

        # M-step: beta MAP (update_beta_map, :169-183; mu stays fixed at 0 as
        # in the reference main loop, which never updates mu).
        num_b = 2 * self.a - 1 + jnp.sum(xi * x1[:, None], axis=0)
        den_b = (
            2 * self.b
            + self.beta_0 * (mu - self.mu_0) ** 2
            + jnp.sum(xi * x1[:, None] * (x0[:, None] - mu[None, :]) ** 2, axis=0)
        )
        beta = num_b / den_b

        # ELBO objective (objective, :185-207).
        sum_i = jnp.sum(
            xi
            * x1[:, None]
            * (
                jnp.log(beta)[None, :]
                - math.log(2 * math.pi)
                - beta[None, :] * (x0[:, None] - mu[None, :]) ** 2
            )
            / 2
            - x1[:, None] * jax.scipy.special.xlogy(xi, xi),
            axis=0,
        )
        sum_j = jnp.sum(
            (self.a - 0.5) * jnp.log(beta)
            - self.beta_0 * beta * (mu - self.mu_0) ** 2 / 2
            - self.b * beta
            + sum_i
        )
        log_integral = jnp.sum(jax.scipy.special.gammaln(alpha_bar)) - (
            jax.scipy.special.gammaln(jnp.sum(alpha_bar))
        )
        objective = sum_j + log_integral
        return (pi, mu, beta, alpha_bar), objective

    def update(self, x0, x1=None):
        if x1 is None:
            x1 = jnp.ones_like(x0)
        s = self.state
        (pi, mu, beta, alpha_bar), obj = self._update(
            (s.pi, s.mu, s.beta, s.alpha_bar), x0, x1
        )
        self.state = EMState(pi, mu, beta, alpha_bar)
        return float(obj)

    def fit(self, x0, x1=None, n_iter: int = 30):
        return [self.update(x0, x1) for _ in range(n_iter)]


def gaussian_mixture(x, pi, mu, beta):
    """Zero-integral-normalized mixture density (train_penalty_em.py:63-66)."""
    x = np.asarray(x)
    pi, mu, beta = np.asarray(pi), np.asarray(mu), np.asarray(beta)
    arg = -beta[None, :] * (x[:, None] - mu[None, :]) ** 2
    w = pi * np.sqrt(beta) / np.sqrt(2 * np.pi)
    return np.sum(w[None, :] * np.exp(arg / 2), axis=1)


def fwhm_scale(pi, mu, beta, reference_fwhm: float):
    """Scale factor a such that the mixture with a*beta has the reference
    full-width-half-maximum (train_penalty_em.py:319-323)."""
    from scipy.optimize import root_scalar

    def func(a):
        return float(
            gaussian_mixture(np.array([reference_fwhm / 2]), pi, mu, a * beta)[0]
            - gaussian_mixture(np.array([0.0]), pi, mu, a * beta)[0] / 2
        )

    sol = root_scalar(func, method="bisect", bracket=[1e-6, 100])
    return sol.root


def robust_l1_fwhm(eps: float = 0.001) -> float:
    return 2 * np.sqrt((eps + np.log(2)) ** 2 - eps**2)


def abs_robust_loss_fwhm(eps: float = 0.01, q: float = 0.4) -> float:
    return 2 * (np.power(eps**q + np.log(2), 1 / q) - eps)


def collect_residuals(loader, loss_cfg, penalty: str = "smooth",
                      subsample: float = 0.95, n_samples: float = 3e6,
                      seed: int = 0, with_bk: bool = True):
    """Sample per-pixel residuals from GT flow (train_penalty_em.py:236-289).

    penalty='data' samples photometric residuals; 'smooth' samples flow
    gradients. Returns a 1-D numpy array.
    """
    from arflow_tpu.losses.blocks import data_loss_no_penalty, smooth_loss_no_penalty
    from arflow_tpu.ops import downsample

    rng = np.random.RandomState(seed)
    out = []
    total = 0
    for data in loader:
        if total > n_samples:
            break
        im1 = jnp.asarray(data["img1"])
        im2 = jnp.asarray(data["img2"])
        flow12 = jnp.asarray(data["target"]["flow"][..., :2])
        flow21 = jnp.asarray(data["target"]["flow_bw"][..., :2])
        f12_2 = downsample(flow12, is_flow=True, scale_factor=4)
        f21_2 = downsample(flow21, is_flow=True, scale_factor=4)

        losses, weights = [], []
        if penalty == "data":
            pl12, pw12, _, _ = data_loss_no_penalty(
                im1, im2, f12_2, f21_2, "none", loss_cfg.data_loss
            )
            losses.append(np.asarray(pl12[0]))
            weights.append(np.asarray(pw12[0]))
            if with_bk:
                pl21, pw21, _, _ = data_loss_no_penalty(
                    im2, im1, f21_2, f12_2, "none", loss_cfg.data_loss
                )
                losses.append(np.asarray(pl21[0]))
                weights.append(np.asarray(pw21[0]))
        else:
            sx, wx, sy, wy = smooth_loss_no_penalty(
                im1, f12_2, loss_cfg.edge_constant, loss_cfg.edge_asymp
            )
            losses += [np.asarray(sx[:, :, :-1, :]), np.asarray(sy[:, :-1, :, :])]
            weights += [
                np.repeat(np.asarray(wx[:, :, :-1, :]), 2, axis=-1),
                np.repeat(np.asarray(wy[:, :-1, :, :]), 2, axis=-1),
            ]
            if with_bk:
                sx2, wx2, sy2, wy2 = smooth_loss_no_penalty(
                    im2, f21_2, loss_cfg.edge_constant, loss_cfg.edge_asymp
                )
                losses += [np.asarray(sx2[:, :, :-1, :]), np.asarray(sy2[:, :-1, :, :])]
                weights += [
                    np.repeat(np.asarray(wx2[:, :, :-1, :]), 2, axis=-1),
                    np.repeat(np.asarray(wy2[:, :-1, :, :]), 2, axis=-1),
                ]

        for loss_map, weight_map in zip(losses, weights):
            w = weight_map / max(weight_map.max(), 1e-12)
            mask = (w > 1e-6) & (rng.rand(*w.shape) > subsample)
            vals = np.broadcast_to(loss_map, mask.shape)[mask]
            out.append(vals.ravel())
            total += vals.size
    return np.concatenate(out) if out else np.zeros(0)
