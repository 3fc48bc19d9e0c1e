#!/usr/bin/env python
"""Chained A/B of the opt-in Taylor warp (ARFLOW_TAYLOR_WARP).

Sparse-ELBO train step @256x448 b4 (cov_supp=3, n_samples=4, census,
occ 'sample' — the bench_chained_ab.py config) and a diag-ELBO occ-'mean'
n4 variant, gate off vs on. Run ALONE on the TPU host:

    python benchmarks/bench_taylor_ab.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CHAIN = 30


def main():
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.config import Config
    from arflow_tpu.losses import get_loss
    from arflow_tpu.models import get_model

    rng = np.random.RandomState(0)
    B, H, W = 4, 256, 448
    im1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    @jax.jit
    def trivial(a):
        return jnp.sum(a)

    def timed(f, *a, reps=5):
        float(f(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    rtt = timed(trivial, im1)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    tx = optax.adam(1e-4)
    cov_supp = 3
    n_off = (cov_supp + 1) ** 2 - 1
    base_loss_cfg = {
        "type": "uflow_elbo", "edge_asymp": 0.01, "w_smooth": 4.0,
        "edge_constant": 150.0, "with_bk": True,
        "penalty_smooth": "charbonnier", "closed_form_smooth": False,
        "isotropic_smooth": False, "data_loss": ["census"],
        "data_weight": [1.0], "data_penalty": ["abs_robust_loss"],
        "w_entropy": 0.1, "w_oof": 0.0, "w_occ": 0.0,
        "n_components": 1, "approx_entropy": False, "n_samples": 4,
        "offdiag_reg": 0.1, "natural_grad": False}

    variants = [
        ("sparse_occ_sample", {"approx": "sparse", "cov_supp": cov_supp,
                               "inv_cov": False, "occ_type": "sample"},
         {"out_channels": [2, 2, 2 * n_off], "inv_cov": False}),
        ("diag_occ_mean", {"approx": "diag", "inv_cov": False,
                           "occ_type": "mean"},
         {"out_channels": [2, 2, 0], "inv_cov": False}),
        # Mixture k2 (bf16, the BASELINE.md mixture config): Taylor uses
        # one gather per COMPONENT (2K total) instead of per sample (2n).
        ("mixture_k2_bf16", {"approx": "mixture", "inv_cov": False,
                             "occ_type": "sample", "n_components": 2,
                             "cov_supp": 0},
         {"out_channels": [2, 2, 0], "inv_cov": False, "n_pyramids": 2,
          "dtype": "bf16"}),
    ]

    for tag, loss_over, model_over in variants:
        model = get_model(Config({
            "type": "uflow_prob", "n_pyramids": 1, "mixture_weights": False,
            "feature_norm": True, "level_dropout": 0.0, **model_over}))
        loss = get_loss(Config({**base_loss_cfg, **loss_over}))
        variables = jax.jit(lambda r: model.init(r, im1, im2, with_bk=True))(
            jax.random.PRNGKey(0))
        params = variables["params"]
        opt = tx.init(params)
        key = jax.random.PRNGKey(1)

        def make_chain():
            @jax.jit
            def chain(p, o, a, b, k):
                def body(carry, kk):
                    p, o = carry

                    def lf(pp):
                        res = model.apply({"params": pp}, a, b, with_bk=True)
                        return loss(res, a, b, rng=kk)["total"]

                    l, g = jax.value_and_grad(lf)(p)
                    u, o2 = tx.update(g, o, p)
                    return (optax.apply_updates(p, u), o2), l

                keys = jax.random.split(k, CHAIN)
                (p2, _), ls = lax.scan(body, (p, o), keys)
                return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

            return chain

        for taylor in ("0", "1"):
            os.environ["ARFLOW_TAYLOR_WARP"] = taylor
            t = (timed(make_chain(), params, opt, im1, im2, key) - rtt) / CHAIN
            print(json.dumps({
                "metric": f"elbo_{tag}_taylor{taylor}",
                "ms": round(t * 1e3, 2),
                "samples_per_s": round(B / max(t, 1e-9), 1),
            }), flush=True)

    del os.environ["ARFLOW_TAYLOR_WARP"]


if __name__ == "__main__":
    main()
