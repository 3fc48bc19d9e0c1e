#!/usr/bin/env python
"""Chained-step A/B of the TPU dispatch decisions (ground-truth timing).

Single-shot fetch timing flatters the step: the scalar fetch returns when
the loss value is ready, before the backward tail finishes, so it
under-reports by up to 2-3x. This bench times CHAIN train steps
back-to-back inside one jitted lax.scan (carry = params/opt state) and
divides — the steady-state number a real training loop sees (validated
against a python-level sequential loop: 70.6 vs 72.9 ms/step).

A/Bs the two env-gated dispatch decisions per step family:
  - ARFLOW_USE_PALLAS (fused cost-volume kernel vs XLA fusion)
  - ARFLOW_BIDIR_BATCH (batched 2B bidirectional model forward vs 2x B)

Run ALONE on the TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_chained_ab.py

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
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

    B = 8
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    rtt = timed(trivial, img1)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}))

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

    for pallas in ("1", "0"):
        for bidir in ("0", "1"):
            os.environ["ARFLOW_USE_PALLAS"] = pallas
            os.environ["ARFLOW_BIDIR_BATCH"] = bidir
            t = (timed(make_chain(), params, opt, img1, img2) - rtt) / CHAIN
            print(json.dumps({
                "metric": f"uflow_chained_pallas{pallas}_bidir{bidir}",
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

    for pallas in ("1", "0"):
        for bidir in ("0", "1"):
            os.environ["ARFLOW_USE_PALLAS"] = pallas
            os.environ["ARFLOW_BIDIR_BATCH"] = bidir
            t = (timed(make_echain(), e_params, e_opt, im1, im2, key) - rtt) / CHAIN
            print(json.dumps({
                "metric": f"elbo_chained_pallas{pallas}_bidir{bidir}",
                "ms": round(t * 1e3, 2),
                "samples_per_s": round(B2 / max(t, 1e-9), 1),
            }))
    # ---- PWCLite 2-frame + unflow loss @ b8 (bidir A/B only) ----
    os.environ["ARFLOW_USE_PALLAS"] = "1"
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

    def make_lchain():
        @jax.jit
        def chain(p, o, a, b):
            def body(carry, _):
                p, o = carry

                def lf(pp):
                    res = l_model.apply({"params": pp}, a, b, with_bk=True)
                    return l_loss(res, a, b)["total"]

                l, g = jax.value_and_grad(lf)(p)
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), l

            (p2, _), ls = lax.scan(body, (p, o), None, length=CHAIN)
            return ls[-1] + jnp.sum(jax.tree_util.tree_leaves(p2)[0])

        return chain

    for bidir in ("1", "0"):
        os.environ["ARFLOW_BIDIR_BATCH"] = bidir
        t = (timed(make_lchain(), l_params, l_opt, img1, img2) - rtt) / CHAIN
        print(json.dumps({
            "metric": f"pwclite2_chained_bidir{bidir}",
            "ms": round(t * 1e3, 2),
            "samples_per_s": round(B / max(t, 1e-9), 1),
        }))

    # ---- PWCLite 5-frame forward, chained (sliding-window batching) ----
    frames5 = [jnp.asarray(rng.rand(4, H, W, 3).astype(np.float32))
               for _ in range(5)]
    f_model = get_model(Config({"type": "pwclite", "n_frames": 5,
                                "upsample": True, "reduce_dense": True}))
    f_vars = jax.jit(lambda r: f_model.init(r, *frames5, with_bk=True))(
        jax.random.PRNGKey(0))

    def make_f5chain():
        @jax.jit
        def chain(p, *ims):
            def body(c, _):
                res = f_model.apply(
                    {"params": p}, ims[0] + c * 1e-12, *ims[1:], with_bk=True
                )
                out = sum(jnp.sum(fl[0]) for fl in res["flows_fw"])
                return c + out * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        return chain

    for bidir in ("1", "0"):
        os.environ["ARFLOW_BIDIR_BATCH"] = bidir
        t = (timed(make_f5chain(), f_vars["params"], *frames5) - rtt) / CHAIN
        print(json.dumps({
            "metric": f"pwclite5_fwd_chained_bidir{bidir}",
            "ms": round(t * 1e3, 2),
            "samples_per_s": round(4 / max(t, 1e-9), 1),
        }))

    del os.environ["ARFLOW_USE_PALLAS"]
    del os.environ["ARFLOW_BIDIR_BATCH"]


if __name__ == "__main__":
    main()
