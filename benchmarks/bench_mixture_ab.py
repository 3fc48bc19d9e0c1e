#!/usr/bin/env python
"""Chained A/B: mixture-ELBO (uflow_prob, n_pyramids=2) component batching.

ARFLOW_COMPONENT_BATCH=1 runs all K components (and both directions) through
ONE shared-weight decoder pass at 2K*B instead of 2K sequential B passes
(arflow_tpu/models/uflow_prob.py). Ground-truth chained timing
(lax.scan train steps, see bench_chained_ab.py). Round-2 baseline:
mixture-k2 123.3 ms/step @256x448 b4 n4 (BASELINE.md ELBO variants table).

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_mixture_ab.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CHAIN = 20


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
    H, W, B = 256, 448, 4
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
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}))

    tx = optax.adam(1e-4)
    loss = get_loss(Config({
        "type": "uflow_elbo", "edge_asymp": 0.01, "w_smooth": 4.0,
        "edge_constant": 150.0, "with_bk": True,
        "penalty_smooth": "charbonnier", "isotropic_smooth": False,
        "data_loss": ["census"], "data_weight": [1.0],
        "data_penalty": ["abs_robust_loss"], "w_entropy": 0.1,
        "w_oof": 0.0, "w_occ": 0.0, "approx": "mixture", "inv_cov": False,
        "cov_supp": 0, "n_components": 2, "n_samples": 4,
        "closed_form_smooth": False, "occ_type": "sample",
        "approx_entropy": False, "offdiag_reg": 0.1, "natural_grad": False,
    }))

    for dtype in (None, "bf16"):
        m_cfg = {"type": "uflow_prob", "out_channels": [2, 2, 0],
                 "inv_cov": False, "n_pyramids": 2, "mixture_weights": False,
                 "feature_norm": True, "level_dropout": 0.0}
        if dtype:
            m_cfg["dtype"] = dtype
        model = get_model(Config(m_cfg))
        variables = jax.jit(lambda r: model.init(r, im1, im2, with_bk=True))(
            jax.random.PRNGKey(0))
        params = variables["params"]
        opt = tx.init(params)
        key = jax.random.PRNGKey(1)

        for comp in ("1", "0"):
            os.environ["ARFLOW_COMPONENT_BATCH"] = comp

            @jax.jit
            def chain(p, o, a, b, k, model=model):
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
                "metric": (f"mixture_k2_chained_comp{comp}"
                           + (f"_{dtype}" if dtype else "_f32")),
                "ms": round(t * 1e3, 2),
                "samples_per_s": round(B / max(t, 1e-9), 1),
            }))

    del os.environ["ARFLOW_COMPONENT_BATCH"]


if __name__ == "__main__":
    main()
