"""Supervised Gaussian-posterior MSE loss ("mse" type).

Reference: losses/mse_loss.py:10-148. The network's level-2 posterior is
sampled (diag or 3-band triangular, covariance or precision parametrization)
and regressed to the resized ground-truth flow, with an entropy bonus and
off-diagonal L2 regularization.

Note: the reference's non-diag branches reference triag helpers whose import
is commented out (losses/mse_loss.py:5) and call the wrong arity — only the
diag path is runnable there. Here all four parametrizations work; the 3-band
triangular ones use bands (diag A, left B, over C) with D = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arflow_tpu.ops import (
    backward_substitution,
    matrix_vector_product,
    matrix_vector_product_T,
    resize_flow,
)


def _tile(x, n):
    if n == 1:
        return x
    return jnp.tile(x, (n,) + (1,) * (x.ndim - 1))


class MseLoss:
    """cfg: w_mse, w_entropy, diag, diag_dominant, inv_cov, approx_entropy,
    n_samples, offdiag_reg, align_corners."""

    def __init__(self, cfg):
        self.cfg = cfg

    def __call__(self, res_dict, gt_flow, rng=None, noise=None):
        cfg = self.cfg
        n = cfg.n_samples
        output = res_dict["flows_fw"] if isinstance(res_dict, dict) else res_dict
        out2 = output[2]
        b, h, w, _ = out2.shape

        mean = out2[..., 0:2]
        log_diag = out2[..., 2:4]
        diag = jnp.exp(log_diag)

        if not cfg.diag:
            left = out2[..., 4:6][:, :, :-1, :]
            over = out2[..., 6:8][:, :-1, :, :]
            if cfg.get("diag_dominant", False):
                diag = (
                    diag
                    + jnp.pad(jnp.abs(left), ((0, 0), (0, 0), (1, 0), (0, 0)))
                    + jnp.pad(jnp.abs(over), ((0, 0), (1, 0), (0, 0), (0, 0)))
                )
            zero_d = jnp.zeros((b, h - 1, w - 1, 2), out2.dtype)

        loss_offdiag = 0.0
        if not cfg.diag:
            loss_offdiag = (
                cfg.offdiag_reg
                * (jnp.mean(jnp.square(left)) + jnp.mean(jnp.square(over)))
                / 2.0
            )

        if noise is not None:
            eps = noise["eps"]
        else:
            if rng is None:
                raise ValueError("MseLoss needs rng (or injected noise)")
            eps = jax.random.normal(rng, (n * b, h, w, 2), out2.dtype)

        mean_t, diag_t, log_diag_t = _tile(mean, n), _tile(diag, n), _tile(log_diag, n)
        if not cfg.diag:
            left_t, over_t, zero_t = _tile(left, n), _tile(over, n), _tile(zero_d, n)

        if cfg.diag and not cfg.inv_cov:
            flow = mean_t + jnp.exp(log_diag_t) * eps
        elif cfg.diag and cfg.inv_cov:
            flow = mean_t + jnp.exp(-log_diag_t) * eps
        elif not cfg.diag and not cfg.inv_cov:
            flow = mean_t + matrix_vector_product(diag_t, left_t, over_t, zero_t, eps)
        else:
            flow = mean_t + backward_substitution(diag_t, left_t, over_t, zero_t, eps)

        # Entropy (losses/mse_loss.py:119-133).
        w_ent = cfg.w_entropy
        if cfg.inv_cov and not cfg.diag and cfg.get("approx_entropy", False):
            tmp = matrix_vector_product_T(
                *(jax.lax.stop_gradient(t) for t in (diag_t, left_t, over_t, zero_t)),
                flow - jax.lax.stop_gradient(mean_t),
            )
            loss_entropy = w_ent * jnp.mean(jnp.sum(tmp * tmp / 2, axis=-1))
        elif cfg.inv_cov:
            loss_entropy = -w_ent * jnp.mean(jnp.sum(log_diag, axis=-1))
        else:
            loss_entropy = w_ent * jnp.mean(jnp.sum(log_diag, axis=-1))

        gt2 = resize_flow(
            gt_flow[..., 0:2], (h, w), align_corners=cfg.get("align_corners", False)
        )
        loss_mse = cfg.w_mse * jnp.mean(jnp.square(flow - _tile(gt2, n)))

        total = loss_mse - loss_entropy + loss_offdiag
        return {
            "total": total,
            "l_mse": loss_mse,
            "entropy": loss_entropy,
            "l_offdiag": loss_offdiag,
        }
