"""Per-pixel flow-uncertainty (entropy) map extraction, per approximation.

Shared by the ELBO trainer validation (trainer/uflow_elbo_trainer.py:173-200)
and the inference CLI (inference.py:55-86). Returns a 2-channel (u, v)
log-std map at full resolution.

Divergences from the reference (its sparse/lowrank/mixture branches are
broken there — commented imports, wrong arity; SURVEY.md §7.4):
- sparse+inv_cov: we return 0.5*log(marginal variance) from the wavefront
  inverse_diagonal (unit-consistent log-std; the reference used the raw
  variance where a log-std was expected).
- mixture: uniform weights are passed when none are predicted (the reference
  calls mixture_entropy without its required weights argument).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from arflow_tpu.ops import inverse_diagonal, upsample
from arflow_tpu.utils.gmm import mixture_entropy


def extract_uv_entropy(flows, loss_cfg, res_dict=None, rng=None):
    """flows: full-res-first level list from the model (forward direction)."""
    approx = loss_cfg.approx
    if approx == "diag":
        return flows[0][..., 2:4]

    if approx == "mixture":
        k = loss_cfg.n_components
        mean = flows[0][..., 0 : k * 2]
        logstd = flows[0][..., k * 2 : k * 2 + 2]
        # Share the first component's log-std across components
        # (uflow_elbo_trainer.py:179-182 does the same slicing).
        logstd_full = jnp.tile(logstd, (1, 1, 1, k))
        if res_dict is not None and "weights_fw" in res_dict:
            weights = res_dict["weights_fw"]
        else:
            b = mean.shape[0]
            weights = jnp.ones((b, k), mean.dtype) / k
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ent = mixture_entropy(rng, mean, logstd_full, weights, n_samples=100)
        return jnp.tile(ent, (1, 1, 1, 2))

    if approx == "sparse":
        if loss_cfg.get("inv_cov", False):
            log_diag = flows[2][..., 2:4]
            left = flows[2][..., 4:6][:, :, :-1, :]
            over = flows[2][..., 6:8][:, :-1, :, :]
            var = inverse_diagonal(jnp.exp(log_diag), left, over)
            log_std = 0.5 * jnp.log(var)
            return upsample(log_std + 2 * math.log(4), is_flow=False, scale_factor=4)
        return flows[0][..., 2:4]

    if approx == "lowrank":
        cols = loss_cfg.columns
        std = flows[2][..., 2 : 2 + 2 * cols]
        u_ent = jnp.log(jnp.sum(std[..., 0::2] ** 2, axis=-1, keepdims=True)) / 2
        v_ent = jnp.log(jnp.sum(std[..., 1::2] ** 2, axis=-1, keepdims=True)) / 2
        uv = jnp.concatenate([u_ent, v_ent], axis=-1)
        return upsample(uv + 2 * math.log(4), is_flow=False, scale_factor=4)

    raise NotImplementedError(f"Invalid approximation {approx}!")
