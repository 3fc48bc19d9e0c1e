#!/usr/bin/env python
"""A/B: batched bidirectional forward (ARFLOW_BIDIR_BATCH) on vs off.

Times the FULL train step (fwd both directions + loss + grad + Adam) for the
UFlow and sparse-ELBO configs with the batched 2B forward enabled and
disabled. The env gate is read at trace time, so each mode gets its own
freshly-traced jit. Run ALONE on the TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_bidir_ab.py

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.config import Config
    from arflow_tpu.losses import get_loss
    from arflow_tpu.models import get_model

    rng = np.random.RandomState(0)
    H, W = 256, 448

    @jax.jit
    def trivial(a):
        return jnp.sum(a)

    def timed(f, *a, reps=10):
        float(f(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    # ---- UFlow @ b8 ----
    B = 8
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    rtt = timed(trivial, img1)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}))

    model = get_model(Config({"type": "uflow", "feature_norm": True,
                              "level_dropout": 0.0}))
    loss = get_loss(Config({"type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
                            "smooth_order": 1, "edge_constant": 150.0,
                            "with_bk": True}))
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=True))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    def make_step(m, lf):
        @jax.jit
        def step(p, o, a, b):
            def f(pp):
                res = m.apply({"params": pp}, a, b, with_bk=True)
                return lf(res, a, b)["total"]

            l, g = jax.value_and_grad(f)(p)
            u, _ = tx.update(g, o, p)
            p2 = optax.apply_updates(p, u)
            return l + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        return step

    for mode in ("1", "0"):
        os.environ["ARFLOW_BIDIR_BATCH"] = mode
        t = timed(make_step(model, loss), params, opt, img1, img2) - rtt
        print(json.dumps({
            "metric": f"uflow_full_step_bidir{mode}",
            "ms": round(t * 1e3, 2),
            "samples_per_s": round(B / max(t, 1e-9), 1),
        }))

    # ---- sparse ELBO @ b4 ----
    B2 = 4
    im1, im2 = img1[:B2], img2[:B2]
    cov_supp = 3
    n_off = (cov_supp + 1) ** 2 - 1
    e_model = get_model(Config({
        "type": "uflow_prob", "out_channels": [2, 2, 2 * n_off],
        "inv_cov": False, "n_pyramids": 1, "mixture_weights": False,
        "feature_norm": True, "level_dropout": 0.0}))
    e_loss = get_loss(Config({
        "type": "uflow_elbo", "edge_asymp": 0.01, "w_smooth": 4.0,
        "edge_constant": 150.0, "with_bk": True,
        "penalty_smooth": "charbonnier", "closed_form_smooth": False,
        "isotropic_smooth": False, "data_loss": ["census"],
        "data_weight": [1.0], "data_penalty": ["abs_robust_loss"],
        "w_entropy": 0.1, "w_oof": 0.0, "w_occ": 0.0, "approx": "sparse",
        "cov_supp": cov_supp, "n_components": 1, "inv_cov": False,
        "approx_entropy": False, "occ_type": "sample", "n_samples": 4,
        "offdiag_reg": 0.1, "natural_grad": False}))
    e_vars = jax.jit(lambda r: e_model.init(r, im1, im2, with_bk=True))(
        jax.random.PRNGKey(0))
    e_params = e_vars["params"]
    e_opt = tx.init(e_params)
    key = jax.random.PRNGKey(1)

    def make_estep():
        @jax.jit
        def step(p, o, a, b, k):
            def f(pp):
                res = e_model.apply({"params": pp}, a, b, with_bk=True)
                return e_loss(res, a, b, rng=k)["total"]

            l, g = jax.value_and_grad(f)(p)
            u, _ = tx.update(g, o, p)
            p2 = optax.apply_updates(p, u)
            return l + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        return step

    for mode in ("1", "0"):
        os.environ["ARFLOW_BIDIR_BATCH"] = mode
        t = timed(make_estep(), e_params, e_opt, im1, im2, key) - rtt
        print(json.dumps({
            "metric": f"elbo_full_step_bidir{mode}",
            "ms": round(t * 1e3, 2),
            "samples_per_s": round(B2 / max(t, 1e-9), 1),
        }))

    # ---- PWCLite 2-frame + unflow loss @ b8 ----
    l_model = get_model(Config({"type": "pwclite", "n_frames": 2,
                                "upsample": True, "reduce_dense": True}))
    l_loss = get_loss(Config({
        "type": "unflow", "occ_from_back": True, "w_l1": 0.15, "w_ssim": 0.85,
        "w_ternary": 0.0, "w_smooth": 75.0, "smooth_2nd": True, "alpha": 10,
        "w_scales": [1.0, 1.0, 1.0, 1.0, 0.0, 0.0],
        "w_sm_scales": [1.0, 0.0, 0.0, 0.0, 0.0, 0.0], "warp_pad": "border",
        "with_bk": True}))
    l_vars = jax.jit(lambda r: l_model.init(r, img1, img2, with_bk=True))(
        jax.random.PRNGKey(0))
    l_params = l_vars["params"]
    l_opt = tx.init(l_params)

    def make_lstep():
        @jax.jit
        def step(p, o, a, b):
            def f(pp):
                res = l_model.apply({"params": pp}, a, b, with_bk=True)
                out = l_loss(res, a, b)
                return out["total"]

            l, g = jax.value_and_grad(f)(p)
            u, _ = tx.update(g, o, p)
            p2 = optax.apply_updates(p, u)
            return l + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        return step

    for mode in ("1", "0"):
        os.environ["ARFLOW_BIDIR_BATCH"] = mode
        t = timed(make_lstep(), l_params, l_opt, img1, img2) - rtt
        print(json.dumps({
            "metric": f"pwclite2_full_step_bidir{mode}",
            "ms": round(t * 1e3, 2),
            "samples_per_s": round(B / max(t, 1e-9), 1),
        }))

    # ---- PWCLite 5-frame forward (sliding-window batching) @ b4 ----
    frames5 = [jnp.asarray(rng.rand(4, H, W, 3).astype(np.float32))
               for _ in range(5)]
    f_model = get_model(Config({"type": "pwclite", "n_frames": 5,
                                "upsample": True, "reduce_dense": True}))
    f_vars = jax.jit(lambda r: f_model.init(r, *frames5, with_bk=True))(
        jax.random.PRNGKey(0))

    def make_f5():
        @jax.jit
        def fwd(p, *ims):
            res = f_model.apply({"params": p}, *ims, with_bk=True)
            return sum(jnp.sum(fl[0]) for fl in res["flows_fw"])

        return fwd

    for mode in ("1", "0"):
        os.environ["ARFLOW_BIDIR_BATCH"] = mode
        t = timed(make_f5(), f_vars["params"], *frames5) - rtt
        print(json.dumps({
            "metric": f"pwclite5_fwd_bidir{mode}",
            "ms": round(t * 1e3, 2),
            "samples_per_s": round(4 / max(t, 1e-9), 1),
        }))
    del os.environ["ARFLOW_BIDIR_BATCH"]


if __name__ == "__main__":
    main()
