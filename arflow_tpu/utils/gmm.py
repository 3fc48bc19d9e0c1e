"""Gaussian-mixture log pdf and Monte-Carlo mixture entropy.

Reference: utils/misc_utils.py:67-132. Channels-last layout: flow samples are
(S*B, H, W, 2) samples-major; mixture params (B, H, W, 2K) with u components
at even channels and v at odd channels; weights (B, K).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sum_exp(x, w=1.0, axis=0):
    x_max = jnp.max(x, axis=axis, keepdims=True)
    return x_max + jnp.log(jnp.sum(w * jnp.exp(x - x_max), axis=axis, keepdims=True))


def gaussian_mixture_log_pdf(flow, mean, log_std, weights, per_pixel: bool = False):
    """Mixture log-density of flow samples (utils/misc_utils.py:71-103).

    flow: (S*B,H,W,2); mean/log_std: (B,H,W,2K); weights: (B,K).
    Returns (S*B, 1) (average-per-pixel log pdf) or (S*B,H,W,1) if per_pixel.
    """
    nsamples = flow.shape[0] // mean.shape[0]
    tile = lambda t: jnp.tile(t, (nsamples,) + (1,) * (t.ndim - 1))
    mean = tile(mean)
    log_std = tile(log_std)
    weights = jnp.tile(weights, (nsamples, 1))
    std = jnp.exp(log_std)

    u_err = (flow[..., 0:1] - mean[..., 0::2]) / std[..., 0::2]  # (S*B,H,W,K)
    v_err = (flow[..., 1:2] - mean[..., 1::2]) / std[..., 1::2]
    err_sq = u_err * u_err + v_err * v_err
    log_det = log_std[..., 0::2] + log_std[..., 1::2]

    if per_pixel:
        return log_sum_exp(
            -log_det - err_sq / 2.0, weights[:, None, None, :], axis=-1
        )

    err_sq = jnp.sum(err_sq, axis=(1, 2))  # (S*B, K)
    log_det = jnp.sum(log_det, axis=(1, 2))
    rows, cols = flow.shape[1], flow.shape[2]
    return log_sum_exp(-log_det - err_sq / 2.0, weights, axis=1) / (rows * cols)


def mixture_entropy(rng, mean, log_std, weights, n_samples: int = 100):
    """MC estimate of per-pixel mixture entropy (utils/misc_utils.py:106-132)."""
    std = jnp.exp(log_std)
    b, h, w, _ = mean.shape

    def one_sample(key):
        kz, ke = jax.random.split(key)
        z = jax.random.categorical(kz, jnp.log(weights), shape=(b,))

        def select(params):
            idx_u = (2 * z)[:, None, None, None]
            idx_v = (2 * z + 1)[:, None, None, None]
            pu = jnp.take_along_axis(
                params, jnp.broadcast_to(idx_u, (b, h, w, 1)), axis=-1
            )
            pv = jnp.take_along_axis(
                params, jnp.broadcast_to(idx_v, (b, h, w, 1)), axis=-1
            )
            return jnp.concatenate([pu, pv], axis=-1)

        flow = select(mean) + select(std) * jax.random.normal(
            ke, (b, h, w, 2), mean.dtype
        )
        return -gaussian_mixture_log_pdf(flow, mean, log_std, weights, per_pixel=True)

    keys = jax.random.split(rng, n_samples)
    ent = jax.lax.map(one_sample, keys)
    return jnp.mean(ent, axis=0)
