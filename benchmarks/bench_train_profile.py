#!/usr/bin/env python
"""Train-step breakdown on the TPU (VERDICT r1 item 2).

Times the UFlow and sparse-ELBO training steps and their components via
jitted sub-programs ending in a scalar fetch (tunnel methodology: subtract
trivial-fetch RTT, medians over reps). Run ALONE on the TPU host:

    PYTHONPATH=/root/repo python benchmarks/bench_train_profile.py [--elbo]

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elbo", action="store_true", help="include ELBO rows")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

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

    def timed(f, *a, reps=args.reps):
        float(f(*a))  # compile/warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    def report(name, seconds, batch):
        print(json.dumps({
            "metric": name, "ms": round(seconds * 1e3, 2),
            "samples_per_s": round(batch / max(seconds, 1e-9), 1),
        }))

    # ---- UFlow @ b8 ----
    B = 8
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    rtt = timed(trivial, img1)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}))

    model = get_model(Config({"type": "uflow", "feature_norm": True,
                              "level_dropout": 0.0}))
    loss_cfg = Config({"type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
                       "smooth_order": 1, "edge_constant": 150.0,
                       "with_bk": True})
    loss = get_loss(loss_cfg)
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=True))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def fwd_only(p, a, b):
        res = model.apply({"params": p}, a, b, with_bk=True)
        return sum(jnp.sum(f) for f in res["flows_fw"]) + sum(
            jnp.sum(f) for f in res["flows_bw"])

    def make_loss_fn(cfg_over):
        cfg = Config(dict(loss_cfg))
        cfg.update(cfg_over)
        lf = get_loss(cfg)

        @jax.jit
        def fwd_loss(p, a, b):
            res = model.apply({"params": p}, a, b, with_bk=True)
            return lf(res, a, b)["total"]

        return fwd_loss

    @jax.jit
    def full_step(p, o, a, b):
        def lf(pp):
            res = model.apply({"params": pp}, a, b, with_bk=True)
            return loss(res, a, b)["total"]

        l, g = jax.value_and_grad(lf)(p)
        u, o2 = tx.update(g, o, p)
        p2 = optax.apply_updates(p, u)
        return l + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

    t_fwd = timed(fwd_only, params, img1, img2) - rtt
    report("uflow_fwd_b8_256x448", t_fwd, B)
    t_fl = timed(make_loss_fn({}), params, img1, img2) - rtt
    report("uflow_fwd+loss", t_fl, B)
    t_census = timed(make_loss_fn({"w_smooth": 0.0}), params, img1, img2) - rtt
    report("uflow_fwd+loss_census_only", t_census, B)
    t_smooth = timed(make_loss_fn({"w_census": 0.0}), params, img1, img2) - rtt
    report("uflow_fwd+loss_smooth_only", t_smooth, B)
    t_full = timed(full_step, params, opt, img1, img2) - rtt
    report("uflow_full_step", t_full, B)
    print(json.dumps({
        "metric": "uflow_breakdown_ms",
        "fwd": round(t_fwd * 1e3, 1),
        "loss": round((t_fl - t_fwd) * 1e3, 1),
        "census_part": round((t_census - t_fwd) * 1e3, 1),
        "smooth_part": round((t_smooth - t_fwd) * 1e3, 1),
        "bwd+adam": round((t_full - t_fl) * 1e3, 1),
    }))

    # ---- bf16-compute train step (EPE-safe per BASELINE.md round 2) ----
    model_bf16 = get_model(Config({"type": "uflow", "feature_norm": True,
                                   "level_dropout": 0.0, "dtype": "bf16"}))

    @jax.jit
    def full_step_bf16(p, o, a, b):
        def lf(pp):
            res = model_bf16.apply({"params": pp}, a, b, with_bk=True)
            return loss(res, a, b)["total"]

        l, g = jax.value_and_grad(lf)(p)
        u, o2 = tx.update(g, o, p)
        p2 = optax.apply_updates(p, u)
        return l + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

    t_full_bf16 = timed(full_step_bf16, params, opt, img1, img2) - rtt
    report("uflow_full_step_bf16", t_full_bf16, B)

    # ---- chained steps: the definitive number -------------------------
    # N Adam steps back-to-back inside ONE jitted lax.scan (carry =
    # params/opt state) — steady-state per-step time with the tunnel's
    # 25-40 ms fetch jitter amortized to noise. This is also exactly what
    # the training loop does between metric fetches.
    CHAIN = 20

    def make_chain(m):
        from jax import lax as jlax

        @jax.jit
        def chain(p, o, a, b):
            def body(carry, _):
                p, o = carry

                def lf(pp):
                    res = m.apply({"params": pp}, a, b, with_bk=True)
                    return loss(res, a, b)["total"]

                l, g = jax.value_and_grad(lf)(p)
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), l

            (p2, _), ls = jlax.scan(body, (p, o), None, length=CHAIN)
            return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        return chain

    t_chain = (timed(make_chain(model), params, opt, img1, img2) - rtt) / CHAIN
    report("uflow_full_step_chained", t_chain, B)
    t_chain_bf16 = (
        timed(make_chain(model_bf16), params, opt, img1, img2) - rtt
    ) / CHAIN
    report("uflow_full_step_bf16_chained", t_chain_bf16, B)

    if not args.elbo:
        return

    # ---- sparse ELBO @ b4 (BASELINE round-1 row: 166 ms) ----
    B2 = 4
    im1 = img1[:B2]
    im2 = img2[:B2]
    cov_supp = 3
    n_off = (cov_supp + 1) ** 2 - 1
    e_model = get_model(Config({
        "type": "uflow_prob", "out_channels": [2, 2, 2 * n_off],
        "inv_cov": False, "n_pyramids": 1, "mixture_weights": False,
        "feature_norm": True, "level_dropout": 0.0}))
    e_cfg = Config({
        "type": "uflow_elbo", "edge_asymp": 0.01, "w_smooth": 4.0,
        "edge_constant": 150.0, "with_bk": True,
        "penalty_smooth": "charbonnier", "closed_form_smooth": False,
        "isotropic_smooth": False, "data_loss": ["census"],
        "data_weight": [1.0], "data_penalty": ["abs_robust_loss"],
        "w_entropy": 0.1, "w_oof": 0.0, "w_occ": 0.0, "approx": "sparse",
        "cov_supp": cov_supp, "n_components": 1, "inv_cov": False,
        "approx_entropy": False, "occ_type": "sample", "n_samples": 4,
        "offdiag_reg": 0.1, "natural_grad": False})
    e_loss = get_loss(e_cfg)
    e_vars = jax.jit(lambda r: e_model.init(r, im1, im2, with_bk=True))(
        jax.random.PRNGKey(0))
    e_params = e_vars["params"]
    e_opt = tx.init(e_params)

    @jax.jit
    def e_fwd(p, a, b):
        res = e_model.apply({"params": p}, a, b, with_bk=True)
        return sum(jnp.sum(f) for f in res["flows_fw"])

    def e_loss_fn(cfg_over):
        cfg = Config(dict(e_cfg))
        cfg.update(cfg_over)
        lf = get_loss(cfg)

        @jax.jit
        def f(p, a, b, key):
            res = e_model.apply({"params": p}, a, b, with_bk=True)
            return lf(res, a, b, rng=key)["total"]

        return f

    @jax.jit
    def e_step(p, o, a, b, key):
        def lf(pp):
            res = e_model.apply({"params": pp}, a, b, with_bk=True)
            return e_loss(res, a, b, rng=key)["total"]

        l, g = jax.value_and_grad(lf)(p)
        u, o2 = tx.update(g, o, p)
        p2 = optax.apply_updates(p, u)
        return l + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

    key = jax.random.PRNGKey(1)
    t_efwd = timed(e_fwd, e_params, im1, im2) - rtt
    report("elbo_fwd_b4", t_efwd, B2)
    t_el = timed(e_loss_fn({}), e_params, im1, im2, key) - rtt
    report("elbo_fwd+loss_n4", t_el, B2)
    t_el1 = timed(e_loss_fn({"n_samples": 1}), e_params, im1, im2, key) - rtt
    report("elbo_fwd+loss_n1", t_el1, B2)
    t_esm = timed(e_loss_fn({"w_smooth": 0.0}), e_params, im1, im2, key) - rtt
    report("elbo_fwd+loss_no_smooth", t_esm, B2)
    # census+reparam only (smooth & entropy constant-folded away).
    t_eco = timed(
        e_loss_fn({"w_smooth": 0.0, "w_entropy": 0.0}), e_params, im1, im2, key
    ) - rtt
    report("elbo_fwd+loss_census_only", t_eco, B2)
    # no data loss at all (census/warp/range-map DCE'd; smooth+entropy left).
    t_end = timed(e_loss_fn({"data_loss": [], "data_weight": [],
                             "data_penalty": []}), e_params, im1, im2, key) - rtt
    report("elbo_fwd+loss_no_census", t_end, B2)
    t_efull = timed(e_step, e_params, e_opt, im1, im2, key) - rtt
    report("elbo_full_step_n4", t_efull, B2)
    print(json.dumps({
        "metric": "elbo_breakdown_ms",
        "fwd": round(t_efwd * 1e3, 1),
        "loss_n4": round((t_el - t_efwd) * 1e3, 1),
        "loss_n1": round((t_el1 - t_efwd) * 1e3, 1),
        "bwd+adam": round((t_efull - t_el) * 1e3, 1),
    }))

    # Chained steps (see the uflow chained rows): definitive per-step time.
    from jax import lax as jlax

    @jax.jit
    def e_chain(p, o, a, b, key):
        def body(carry, k):
            p, o = carry

            def lf(pp):
                res = e_model.apply({"params": pp}, a, b, with_bk=True)
                return e_loss(res, a, b, rng=k)["total"]

            l, g = jax.value_and_grad(lf)(p)
            u, o2 = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o2), l

        keys = jax.random.split(key, CHAIN)
        (p2, _), ls = jlax.scan(body, (p, o), keys)
        return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

    t_echain = (
        timed(e_chain, e_params, e_opt, im1, im2, key) - rtt
    ) / CHAIN
    report("elbo_full_step_chained", t_echain, B2)


if __name__ == "__main__":
    main()
