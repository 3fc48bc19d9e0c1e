#!/usr/bin/env python
"""Taylor-warp vs exact-warp ELBO training comparison (DIVERGENCES #24).

Trains the same UNSUPERVISED task twice — diag-ELBO (census data loss,
occ 'mean', n_samples=4, the configuration whose MC-sample warp gathers
the Taylor path replaces) on smoothed-noise pairs with a known (3, 1) px
shift — exact warp vs ``ARFLOW_TAYLOR_WARP=1``, same data and init, and
reports both EPE-vs-known-shift trajectories plus the final delta
(accept threshold: <=0.05 px, the BASELINE.json parity band).

Run on the TPU host: python -m arflow_tpu.tools.taylor_compare
Prints one JSON line with the verdict.
"""

from __future__ import annotations

import json
import os

import numpy as np


def make_pairs(rng, n, h=128, w=160, dx=3.0, dy=1.0):
    from scipy.ndimage import convolve

    k = np.ones((5, 5)) / 25.0
    p1, p2 = [], []
    for _ in range(n):
        base = rng.rand(h + 2, w + 4, 3).astype(np.float32)
        base = np.stack([convolve(base[..., c], k) for c in range(3)], -1)
        p1.append(base[:h, :w])
        p2.append(base[1 : h + 1, 3 : w + 3])
    return np.stack(p1), np.stack(p2), (dx, dy)


def train_one(taylor, img1, img2, dxy, steps, record_every=25):
    import jax
    import jax.numpy as jnp
    import optax

    from arflow_tpu.config import Config
    from arflow_tpu.losses import get_loss
    from arflow_tpu.models import get_model

    os.environ["ARFLOW_TAYLOR_WARP"] = taylor

    model = get_model(Config({
        "type": "uflow_prob", "out_channels": [2, 2, 0], "inv_cov": False,
        "n_pyramids": 1, "mixture_weights": False, "feature_norm": True,
        "level_dropout": 0.0}))
    loss = get_loss(Config({
        "type": "uflow_elbo", "edge_asymp": 0.01, "w_smooth": 4.0,
        "edge_constant": 150.0, "with_bk": True,
        "penalty_smooth": "charbonnier", "closed_form_smooth": False,
        "isotropic_smooth": False, "data_loss": ["census"],
        "data_weight": [1.0], "data_penalty": ["abs_robust_loss"],
        "w_entropy": 0.1, "w_oof": 0.0, "w_occ": 0.0, "approx": "diag",
        "n_components": 1, "inv_cov": False, "approx_entropy": False,
        "occ_type": "mean", "n_samples": 4, "offdiag_reg": 0.1,
        "natural_grad": False}))

    a = jnp.asarray(img1)
    b = jnp.asarray(img2)
    variables = jax.jit(lambda r: model.init(r, a, b, with_bk=True))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    tx = optax.adam(2e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, k):
        def lf(pp):
            res = model.apply({"params": pp}, a, b, with_bk=True)
            return loss(res, a, b, rng=k)["total"]

        l, g = jax.value_and_grad(lf)(p)
        u, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, u), o2, l

    @jax.jit
    def epe(p):
        res = model.apply({"params": p}, a, b, with_bk=False)
        flow = res["flows_fw"][0][..., :2]
        gt = jnp.asarray([dxy[0], dxy[1]], dtype=jnp.float32)
        return jnp.mean(jnp.linalg.norm(flow - gt, axis=-1))

    key = jax.random.PRNGKey(7)
    traj = []
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt, l = step(params, opt, k)
        if (i + 1) % record_every == 0:
            traj.append(round(float(epe(params)), 4))
    return traj


def main():
    rng = np.random.RandomState(0)
    img1, img2, dxy = make_pairs(rng, 4)
    steps = 300
    t_exact = train_one("0", img1, img2, dxy, steps)
    t_taylor = train_one("1", img1, img2, dxy, steps)
    delta = abs(t_exact[-1] - t_taylor[-1])
    print(json.dumps({
        "metric": "taylor_warp_epe_compare",
        "epe_exact": t_exact,
        "epe_taylor": t_taylor,
        "final_delta_px": round(delta, 4),
        "accept_band_px": 0.05,
        "ok": bool(delta <= 0.05),
    }))


if __name__ == "__main__":
    main()
