"""Penalty functions and Gaussian-mixture log pdf penalties.

Reference: losses/penalty_functions.py:1-28 and losses/uflow_elbo_loss.py:99-105
(``log_gmm``). The reference's GMM configs (configs/chairs_uflow_elbo_gmm.json)
request ``penalty_smooth: "gmm"`` but its ``get_penalty`` never handles the
name (latent gap); here the gmm penalty is wired properly as the negative GMM
log-density with config-supplied (pi, beta).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def identity(x):
    return x


def identity_prime(x):
    return jnp.ones_like(x)


def charbonnier(x_sq, eps: float = 0.001):
    return jnp.sqrt(x_sq + eps**2)


def charbonnier_prime(x_sq, eps: float = 0.001):
    return 1.0 / (2.0 * jnp.sqrt(x_sq + eps**2))


def abs_robust_loss(diff, eps: float = 0.01, q: float = 0.4):
    return jnp.power(jnp.abs(diff) + eps, q)


def log_gmm(x, pi, beta):
    """Log-density of a zero-mean scale mixture of Gaussians.

    Reference: losses/uflow_elbo_loss.py:99-105. x: any shape; pi/beta: (K,).
    """
    pi = jnp.asarray(pi, dtype=x.dtype)
    beta = jnp.asarray(beta, dtype=x.dtype)
    arg = -beta * jnp.square(x)[..., None] / 2.0
    w = pi * jnp.sqrt(beta) / math.sqrt(2.0 * math.pi)
    c = jnp.max(arg, axis=-1)
    return c + jnp.log(jnp.sum(w * jnp.exp(arg - c[..., None]), axis=-1))


def get_penalty(name: str, derivative: bool = False, pi=None, beta=None):
    """Penalty factory (losses/penalty_functions.py:19-28, + gmm support)."""
    if name == "identity":
        return identity_prime if derivative else identity
    if name == "charbonnier":
        return charbonnier_prime if derivative else charbonnier
    if name == "abs_robust_loss":
        if derivative:
            raise NotImplementedError("derivative not implemented for abs_robust_loss")
        return abs_robust_loss
    if name == "gmm":
        if derivative:
            raise NotImplementedError("derivative not implemented for gmm penalty")
        if pi is None or beta is None:
            raise ValueError("gmm penalty requires pi and beta arrays")

        def gmm_penalty(x):
            # Penalties receive squared differences; the GMM is over the
            # signed residual, so penalize via the density of sqrt(x).
            return -log_gmm(jnp.sqrt(jnp.maximum(x, 0.0)), pi, beta)

        return gmm_penalty
    raise NotImplementedError(name)
