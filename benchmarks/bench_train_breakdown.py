#!/usr/bin/env python
"""Training-step attribution at the bench shape (round-5, VERDICT r4 #2).

Three questions, one process, chained ground-truth timing throughout
(CHAIN steps back-to-back inside one jitted lax.scan, total minus
trivial-fetch RTT, divided by CHAIN — see benchmarks/bench_chained_ab.py
for why single-shot timing under-reports):

1. **Per-stage attribution** of the uflow train step @256x448 b8
   (f32 + bf16): forward-only, forward+loss, forward+backward
   (value_and_grad), optimizer-only, full step — with XLA cost-analysis
   FLOPs per sub-program so each stage gets an MFU figure like the
   inference tables (benchmarks/bench_mfu_breakdown.py).
2. **Harness reconciliation**: BENCH_r04 reported 120.9 samples/s bf16
   while the round-2 chained table says 135 (BASELINE.md "Train-step
   optimization"). Both harnesses run here back-to-back in one process:
   same chain, different final consumption (bench.py sums EVERY param
   leaf in f32; bench_chained_ab consumes one leaf + the last loss).
3. **Training relayout A/B** (exact-numerics gates, grads pinned by
   tests/test_wfold_pyramid.py / tests/test_hfold.py): W-folded feature
   pyramid (ARFLOW_WFOLD_PYR) and H-folded dilated refinement
   (ARFLOW_HFOLD_REFINE) inside the full bf16 train step.

Reference hot loop being matched: /root/reference/trainer/uflow_trainer.py:48-73.

Run ALONE on the TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_train_breakdown.py

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CHAIN = 20
PEAK_TFLOPS = 197.0  # TPU v5e bf16 MXU peak


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
    B, H, W = 8, 256, 448
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
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
        ts = np.asarray(ts)
        return float(np.median(ts)), float((ts.max() - ts.min()) / np.median(ts))

    rtt, _ = timed(trivial, img1)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}))

    loss = get_loss(Config({"type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
                            "smooth_order": 1, "edge_constant": 150.0,
                            "with_bk": True}))

    def flops_of(fn, *a):
        try:
            an = jax.jit(fn).lower(*a).compile().cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            return float(an.get("flops", 0.0)) or None
        except Exception:
            return None

    def report(name, ms, flops=None, samples=None):
        row = {"metric": name, "ms": round(ms * 1e3, 3)}
        if samples:
            row["samples_per_s"] = round(samples / ms, 1)
        if flops:
            tf = flops / ms / 1e12
            row["tflops_per_s"] = round(tf, 1)
            row["mfu_pct"] = round(100.0 * tf / PEAK_TFLOPS, 1)
        print(json.dumps(row))
        return row

    for mode, mcfg in (("f32", {}), ("bf16", {"dtype": "bf16"})):
        model = get_model(Config({"type": "uflow", "feature_norm": True,
                                  "level_dropout": 0.0, **mcfg}))
        params = jax.jit(
            lambda r, _m=model: _m.init(r, img1, img2, with_bk=True)
        )(jax.random.PRNGKey(0))["params"]
        opt = tx.init(params)

        # The REAL trainers trace with train=True (uflow_trainer.py lf);
        # bench.py's training rows historically traced train=False — which
        # since round 4 silently engages the inference-default W-fold. Both
        # are measured below; the attribution stages use the real training
        # path (train=True).
        def lf(pp, a, b, train=True, _m=model):
            res = _m.apply({"params": pp}, a, b, with_bk=True, train=train)
            return loss(res, a, b)["total"]

        # ---- stage sub-programs, each chained with a data-dependent carry
        def fwd_only_chain(p, a, b, _m=model):
            def body(c, _):
                res = _m.apply({"params": p}, a + c * 1e-12, b,
                               with_bk=True, train=True)
                return c + jnp.sum(res["flows_fw"][0]) * 1e-20, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        def fwd_loss_chain(p, a, b):
            def body(c, _):
                return c + lf(p, a + c * 1e-12, b) * 1e-20, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        def grad_chain(p, a, b):
            # fwd+bwd without the optimizer: fold an epsilon of the grad
            # back into params to keep every step live, no adam update.
            def body(p, _):
                l, g = jax.value_and_grad(lambda pp: lf(pp, a, b))(p)
                p2 = jax.tree_util.tree_map(lambda x, gg: x - 1e-30 * gg, p, g)
                return p2, l
            p2, ls = lax.scan(body, p, None, length=CHAIN)
            return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        def opt_only_chain(p, o, g):
            def body(carry, _):
                p, o = carry
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), None
            (p2, _), _ = lax.scan(body, (p, o), None, length=CHAIN)
            return jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        def full_ab_chain(p, o, a, b):
            # bench_chained_ab consumption: one leaf + last loss
            def body(carry, _):
                p, o = carry
                l, g = jax.value_and_grad(lambda pp: lf(pp, a, b))(p)
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), l
            (p2, _), ls = lax.scan(body, (p, o), None, length=CHAIN)
            return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        def full_benchpy_chain(p, o, a, b):
            # bench.py harness: full-tree f32 sum consumption AND the
            # historical train=False trace (wfold-ON inference pyramid)
            def body(carry, _):
                p, o = carry
                _, g = jax.value_and_grad(
                    lambda pp: lf(pp, a, b, train=False))(p)
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), None
            (p2, _), _ = lax.scan(body, (p, o), None, length=CHAIN)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(p2))

        def full_ab_trainfalse_chain(p, o, a, b):
            # ab consumption but train=False — isolates consumption cost
            # from the train-flag trace difference
            def body(carry, _):
                p, o = carry
                l, g = jax.value_and_grad(
                    lambda pp: lf(pp, a, b, train=False))(p)
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), l
            (p2, _), ls = lax.scan(body, (p, o), None, length=CHAIN)
            return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        g0 = jax.jit(jax.grad(lambda pp: lf(pp, img1, img2)))(params)

        t_fwd, _ = timed(jax.jit(fwd_only_chain), params, img1, img2)
        t_fl, _ = timed(jax.jit(fwd_loss_chain), params, img1, img2)
        t_gr, _ = timed(jax.jit(grad_chain), params, img1, img2)
        t_opt, _ = timed(jax.jit(opt_only_chain), params, opt, g0)
        t_ab, s_ab = timed(jax.jit(full_ab_chain), params, opt, img1, img2)
        t_abf, _ = timed(jax.jit(full_ab_trainfalse_chain), params, opt,
                         img1, img2)
        t_bp, s_bp = timed(jax.jit(full_benchpy_chain), params, opt, img1, img2)

        per = lambda t: max(t - rtt, 1e-9) / CHAIN
        f_fwd = flops_of(
            lambda p, a, b: jnp.sum(
                model.apply({"params": p}, a, b, with_bk=True,
                            train=True)["flows_fw"][0]
            ), params, img1, img2)
        f_fl = flops_of(lf, params, img1, img2)
        f_gr = flops_of(
            lambda p, a, b: jax.tree_util.tree_leaves(
                jax.grad(lambda pp: lf(pp, a, b))(p))[0], params, img1, img2)

        pre = f"train_breakdown_{mode}"
        report(f"{pre}_fwd_model", per(t_fwd), f_fwd, B)
        report(f"{pre}_fwd_plus_loss", per(t_fl), f_fl, B)
        report(f"{pre}_fwd_bwd", per(t_gr), f_gr, B)
        report(f"{pre}_optimizer_only", per(t_opt))
        report(f"{pre}_full_trainTrue_ab_consumption", per(t_ab), f_gr, B)
        report(f"{pre}_full_trainFalse_ab_consumption", per(t_abf), f_gr, B)
        report(f"{pre}_full_trainFalse_benchpy_consumption", per(t_bp), f_gr, B)
        print(json.dumps({
            "metric": f"{pre}_attribution_ms",
            "loss_fwd": round((per(t_fl) - per(t_fwd)) * 1e3, 2),
            "bwd": round((per(t_gr) - per(t_fl)) * 1e3, 2),
            "optimizer_alone": round(per(t_opt) * 1e3, 2),
            "opt_in_step": round((per(t_ab) - per(t_gr)) * 1e3, 2),
            "trainflag_gap_trainFalse_minus_trainTrue": round(
                (per(t_abf) - per(t_ab)) * 1e3, 2),
            "consumption_gap_benchpy_minus_ab": round(
                (per(t_bp) - per(t_abf)) * 1e3, 2),
            "spread_ab_pct": round(100 * s_ab, 1),
            "spread_bp_pct": round(100 * s_bp, 1),
        }))

        # ---- relayout A/B inside the full step (bf16 is the headline) ----
        if mode == "bf16":
            for wf, hfr in (("0", "0"), ("1", "0"), ("0", "8"), ("1", "8")):
                os.environ["ARFLOW_WFOLD_PYR"] = wf
                os.environ["ARFLOW_HFOLD_REFINE"] = hfr
                t, sp = timed(jax.jit(full_ab_chain), params, opt, img1, img2)
                report(
                    f"train_bf16_full_wfold{wf}_hfoldrefine{hfr}",
                    per(t), f_gr, B)
            del os.environ["ARFLOW_WFOLD_PYR"]
            del os.environ["ARFLOW_HFOLD_REFINE"]


if __name__ == "__main__":
    main()
