#!/usr/bin/env python
"""Chained A/B of ARFLOW_SPLIT_DECODER x ARFLOW_PYR_BATCH on real TPU.

Times (chained lax.scan, see bench_chained_ab.py for methodology):
  1. bf16 uflow inference forward at the bench shape (b8, 384x640) — the
     bench.py headline program.
  2. f32 uflow train step at b8 256x448 — the BASELINE.md training row.
  3. f32 sparse-ELBO train step at b4 256x448 (uflow_prob shares the
     dense-net decoder; reference uflow_prob_model.py:275-303).

Both gates are algebraic identities (tests/test_uflow_decoder_gates.py),
so this A/B is purely a dispatch-default measurement. Run ALONE on the
TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_decoder_gates_ab.py
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

import numpy as np

CHAIN = 30


def _combos():
    """Gate combos to run: all four, or --combos 00,01 (split,pyr digits)."""
    if "--combos" in sys.argv:
        raw = sys.argv[sys.argv.index("--combos") + 1]
        return [(c[0], c[1]) for c in raw.split(",")]
    return list(itertools.product(("0", "1"), ("0", "1")))


def _sections():
    if "--sections" in sys.argv:
        return sys.argv[sys.argv.index("--sections") + 1].split(",")
    return ["fwd", "train", "elbo"]


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

    run_sections = _sections()
    # ---- 1. bf16 inference forward, bench shape ----
    B, H, W = 8, 384, 640
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    rtt = timed(trivial, img1)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    bf_model = get_model(Config({"type": "uflow", "feature_norm": True,
                                 "level_dropout": 0.0,
                                 "dtype": "bfloat16"}))
    bf_vars = jax.jit(lambda r: bf_model.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0))

    def make_fwd_chain():
        @jax.jit
        def chain(p, a, b):
            def body(c, _):
                res = bf_model.apply({"params": p}, a + c * 1e-12, b,
                                     with_bk=False)
                return c + jnp.sum(res["flows_fw"][0]).astype(jnp.float32) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        return chain

    for split, pyr in (_combos() if "fwd" in run_sections else []):
        os.environ["ARFLOW_SPLIT_DECODER"] = split
        os.environ["ARFLOW_PYR_BATCH"] = pyr
        t = (timed(make_fwd_chain(), bf_vars["params"], img1, img2) - rtt) / CHAIN
        print(json.dumps({
            "metric": f"uflow_bf16_fwd_split{split}_pyr{pyr}",
            "ms": round(t * 1e3, 3),
            "maps_per_s": round(B / max(t, 1e-9), 1),
        }), flush=True)

    # ---- 2. f32 uflow train step ----
    H, W = 256, 448
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    tx = optax.adam(1e-4)

    model = get_model(Config({"type": "uflow", "feature_norm": True,
                              "level_dropout": 0.0}))
    loss = get_loss(Config({"type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
                            "smooth_order": 1, "edge_constant": 150.0,
                            "with_bk": True}))
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=True))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    opt = tx.init(params)

    def make_chain():
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

    for split, pyr in (_combos() if "train" in run_sections else []):
        os.environ["ARFLOW_SPLIT_DECODER"] = split
        os.environ["ARFLOW_PYR_BATCH"] = pyr
        t = (timed(make_chain(), params, opt, img1, img2) - rtt) / CHAIN
        print(json.dumps({
            "metric": f"uflow_train_split{split}_pyr{pyr}",
            "ms": round(t * 1e3, 2),
            "samples_per_s": round(B / max(t, 1e-9), 1),
        }), flush=True)

    # ---- 3. f32 sparse-ELBO train step @ b4 ----
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

    def make_echain():
        @jax.jit
        def chain(p, o, a, b, k):
            def body(carry, kk):
                p, o = carry

                def lf(pp):
                    res = e_model.apply({"params": pp}, a, b, with_bk=True)
                    return e_loss(res, a, b, rng=kk)["total"]

                l, g = jax.value_and_grad(lf)(p)
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), l

            keys = jax.random.split(k, CHAIN)
            (p2, _), ls = lax.scan(body, (p, o), keys)
            return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        return chain

    for split, pyr in (_combos() if "elbo" in run_sections else []):
        os.environ["ARFLOW_SPLIT_DECODER"] = split
        os.environ["ARFLOW_PYR_BATCH"] = pyr
        t = (timed(make_echain(), e_params, e_opt, im1, im2, key) - rtt) / CHAIN
        print(json.dumps({
            "metric": f"elbo_train_split{split}_pyr{pyr}",
            "ms": round(t * 1e3, 2),
            "samples_per_s": round(B2 / max(t, 1e-9), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
