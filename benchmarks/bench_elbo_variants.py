#!/usr/bin/env python
"""Chained-step throughput for every ELBO posterior approximation.

One row per approximation (diag / diag+inv_cov / sparse / mixture /
lowrank) at the shipped-config hyperparameters, plus a batch-16 UFlow row
for batch-scaling context. Chained ground-truth timing (CHAIN steps inside
one lax.scan; see bench_chained_ab.py for why single-shot fetch timing is
wrong). Run ALONE on the TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_elbo_variants.py

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import time

import numpy as np

CHAIN = 20


def main():
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
    H, W = 256, 448
    B = 4
    im1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    tx = optax.adam(1e-4)

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
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}))

    base_loss = {
        "type": "uflow_elbo", "edge_asymp": 0.01, "w_smooth": 4.0,
        "edge_constant": 150.0, "with_bk": True,
        "penalty_smooth": "charbonnier", "isotropic_smooth": False,
        "data_loss": ["census"], "data_weight": [1.0],
        "data_penalty": ["abs_robust_loss"], "w_entropy": 0.1,
        "w_oof": 0.0, "w_occ": 0.0, "n_components": 1,
        "approx_entropy": False, "offdiag_reg": 0.1, "natural_grad": False,
    }
    n_off = (3 + 1) ** 2 - 1

    # (name, model overrides, loss overrides)
    variants = [
        ("diag_n1_closed", {"out_channels": [2, 2, 0], "inv_cov": False},
         {"approx": "diag", "inv_cov": False, "cov_supp": 0, "n_samples": 1,
          "closed_form_smooth": True, "occ_type": "mean"}),
        ("diag_inv_n1", {"out_channels": [2, 2, 0], "inv_cov": True},
         {"approx": "diag", "inv_cov": True, "cov_supp": 0, "n_samples": 1,
          "closed_form_smooth": False, "occ_type": "sample"}),
        ("sparse_n4", {"out_channels": [2, 2, 2 * n_off], "inv_cov": False},
         {"approx": "sparse", "inv_cov": False, "cov_supp": 3, "n_samples": 4,
          "closed_form_smooth": False, "occ_type": "sample"}),
        ("mixture_k2_n4",
         {"out_channels": [2, 2, 0], "inv_cov": False, "n_pyramids": 2},
         {"approx": "mixture", "inv_cov": False, "cov_supp": 0,
          "n_components": 2, "n_samples": 4, "closed_form_smooth": False,
          "occ_type": "sample"}),
        ("lowrank_c8_n4",
         {"out_channels": [2, 0, 16], "inv_cov": False},
         {"approx": "lowrank", "inv_cov": False, "cov_supp": 0, "columns": 8,
          "n_samples": 4, "closed_form_smooth": False, "occ_type": "sample"}),
    ]

    for name, m_over, l_over in variants:
        m_cfg = {"type": "uflow_prob", "inv_cov": False, "n_pyramids": 1,
                 "mixture_weights": False, "feature_norm": True,
                 "level_dropout": 0.0}
        m_cfg.update(m_over)
        l_cfg = dict(base_loss)
        l_cfg.update(l_over)
        model = get_model(Config(m_cfg))
        loss = get_loss(Config(l_cfg))
        try:
            variables = jax.jit(
                lambda r: model.init(r, im1, im2, with_bk=True)
            )(jax.random.PRNGKey(0))
            params = variables["params"]
            opt = tx.init(params)
            key = jax.random.PRNGKey(1)

            @jax.jit
            def chain(p, o, a, b, k, model=model, loss=loss):
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

            t = (timed(chain, params, opt, im1, im2, key) - rtt) / CHAIN
            print(json.dumps({
                "metric": f"elbo_{name}_chained",
                "ms": round(t * 1e3, 2),
                "samples_per_s": round(B / max(t, 1e-9), 1),
            }))
        except Exception as e:  # report, keep going
            print(json.dumps({
                "metric": f"elbo_{name}_chained",
                "error": f"{type(e).__name__}: {e}"[:200],
            }))

    # batch-scaling context: uflow b16 chained
    B16 = 16
    img1 = jnp.asarray(rng.rand(B16, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B16, H, W, 3).astype(np.float32))
    u_model = get_model(Config({"type": "uflow", "feature_norm": True,
                                "level_dropout": 0.0}))
    u_loss = get_loss(Config({"type": "uflow", "w_census": 1.0,
                              "w_smooth": 4.0, "smooth_order": 1,
                              "edge_constant": 150.0, "with_bk": True}))
    u_vars = jax.jit(lambda r: u_model.init(r, img1, img2, with_bk=True))(
        jax.random.PRNGKey(0))
    u_params = u_vars["params"]
    u_opt = tx.init(u_params)

    @jax.jit
    def u_chain(p, o, a, b):
        def body(carry, _):
            p, o = carry

            def lf(pp):
                res = u_model.apply({"params": pp}, a, b, with_bk=True)
                return u_loss(res, a, b)["total"]

            l, g = jax.value_and_grad(lf)(p)
            u, o2 = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o2), l

        (p2, _), ls = lax.scan(body, (p, o), None, length=CHAIN)
        return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

    t = (timed(u_chain, u_params, u_opt, img1, img2) - rtt) / CHAIN
    print(json.dumps({
        "metric": "uflow_b16_chained",
        "ms": round(t * 1e3, 2),
        "samples_per_s": round(B16 / max(t, 1e-9), 1),
    }))


if __name__ == "__main__":
    main()
