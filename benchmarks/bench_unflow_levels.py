#!/usr/bin/env python
"""Close two round-3 candidates by measurement.

1. unflow multi-level photometric cost attribution: the ARFlow loss walks 4
   pyramid levels with per-level warps/resizes (losses/unflow.py); the
   ragged-batching candidate would merge levels 1..3 into one padded pass.
   This measures what levels 1..3 actually cost in the full chained train
   step (w_scales masking; the level list is static at trace time so the
   zero-weight levels are skipped entirely via the `continue`). The
   levels123_only row exercises divergence #27 (the reference crashes on
   w_scales[0]==0).

2. uflow final 2x-upsample pair DCE: the model's two final upsamples
   (models/uflow.py:246-247) produce flows[0] and flows[1]; the uflow loss
   consumes flows[0] and flows[2] only, so flows[1]'s upsample should be
   dead-code-eliminated by XLA. Verified via compiled cost analysis of the
   gradient program with/without a forced use of flows[1].

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_unflow_levels.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CHAIN = 30


def main():
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    os.environ.setdefault("ARFLOW_BIDIR_BATCH", "0")  # measured pwclite default
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.config import Config
    from arflow_tpu.losses import get_loss
    from arflow_tpu.models import get_model

    B, H, W = 8, 256, 448
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

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

    rtt = timed(trivial, jnp.zeros((1,), jnp.float32))
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    # ---- 1. unflow per-level attribution (pwclite + unflow, b8 256x448) ----
    model = get_model(Config({"type": "pwclite", "n_frames": 2,
                              "upsample": True, "reduce_dense": True}))
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=True))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    def loss_cfg(w_scales):
        return Config({
            "type": "unflow", "occ_from_back": True, "w_l1": 0.15,
            "w_ssim": 0.85, "w_ternary": 0.0, "w_smooth": 75.0,
            "smooth_2nd": True, "alpha": 10, "w_scales": w_scales,
            "w_sm_scales": [1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            "warp_pad": "border", "with_bk": True,
        })

    def make_chain(loss):
        @jax.jit
        def chain(p, o, a, b):
            def body(carry, _):
                p, o = carry

                def lf(pp):
                    res = model.apply({"params": pp}, a, b, with_bk=True)
                    return loss(res, a, b)["total"]

                l, g = jax.value_and_grad(lf)(p)
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), l

            (p2, _), ls = lax.scan(body, (p, o), None, length=CHAIN)
            return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        return chain

    results = {}
    for name, scales in (
        ("all_levels", [1.0, 1.0, 1.0, 1.0, 0.0, 0.0]),
        ("level0_only", [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        ("levels123_only", [0.0, 1.0, 1.0, 1.0, 0.0, 0.0]),
    ):
        loss = get_loss(loss_cfg(scales))
        t = (timed(make_chain(loss), params, opt, img1, img2) - rtt) / CHAIN
        results[name] = t * 1e3
        print(json.dumps({
            "metric": f"pwclite_unflow_step_{name}",
            "ms": round(t * 1e3, 2),
        }), flush=True)
    print(json.dumps({
        "metric": "unflow_levels123_attribution",
        "ms_vs_level0_only": round(results["all_levels"] - results["level0_only"], 2),
        "pct_of_step": round(
            100 * (results["all_levels"] - results["level0_only"])
            / results["all_levels"], 1),
    }), flush=True)

    # ---- 2. uflow flows[1] upsample DCE (cost analysis) ----
    u_model = get_model(Config({"type": "uflow", "feature_norm": True,
                                "level_dropout": 0.0}))
    u_loss = get_loss(Config({
        "type": "uflow", "w_census": 1.0, "w_smooth": 2.0, "smooth_order": 2,
        "edge_constant": 150.0, "with_bk": True, "occ_from_back": True,
        "occlusion": "wang",
    }))
    u_vars = jax.jit(lambda r: u_model.init(r, img1, img2))(
        jax.random.PRNGKey(0))

    def total(p, a, b, force_use):
        res = u_model.apply({"params": p}, a, b, with_bk=True)
        out = u_loss(res, a, b)["total"]
        if force_use:
            # Data-dependent tiny use so XLA cannot fold it away.
            out = out + 1e-20 * (
                jnp.sum(res["flows_fw"][1]) + jnp.sum(res["flows_bw"][1])
            )
        return out

    flops = {}
    for force_use in (False, True):
        g = jax.jit(jax.grad(
            lambda p, a, b, f=force_use: total(p, a, b, f)))
        c = g.lower(u_vars["params"], img1, img2).compile().cost_analysis()
        flops[force_use] = c.get("flops", float("nan"))
        print(json.dumps({
            "metric": f"uflow_grad_flops_force_use_flows1_{force_use}",
            "gflops": round(flops[force_use] / 1e9, 3),
        }), flush=True)
    print(json.dumps({
        "metric": "flows1_upsample_dce",
        "extra_gflops_when_used": round(
            (flops[True] - flops[False]) / 1e9, 4),
        "dce_confirmed": bool(flops[True] > flops[False]),
    }), flush=True)


if __name__ == "__main__":
    main()
