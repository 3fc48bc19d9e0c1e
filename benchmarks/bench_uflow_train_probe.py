#!/usr/bin/env python
"""Minimal chained uflow-train probe (one number, for drift isolation).

Same config as bench_chained_ab.py's uflow row (f32, b8, 256x448,
pallas=1, bidir=0). Used to separate device/tunnel drift from tree
regressions: run it on two trees back-to-back and compare.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CHAIN = 20


def main():
    os.environ["ARFLOW_USE_PALLAS"] = "1"
    os.environ["ARFLOW_BIDIR_BATCH"] = "0"
    os.environ["ARFLOW_SPLIT_DECODER"] = "0"
    os.environ["ARFLOW_PYR_BATCH"] = "0"
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

    rtt = timed(trivial, img1)

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

    t = (timed(chain, params, opt, img1, img2) - rtt) / CHAIN
    print(json.dumps({
        "metric": "uflow_train_probe",
        "rtt_ms": round(rtt * 1e3, 2),
        "ms": round(t * 1e3, 2),
        "samples_per_s": round(B / max(t, 1e-9), 1),
    }))


if __name__ == "__main__":
    main()
