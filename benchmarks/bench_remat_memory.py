#!/usr/bin/env python
"""Compile-only HBM accounting for the ``train.remat`` flag.

Lowers the full uflow train step (fwd both directions + loss + grads +
Adam) at the Sintel-flagship 448x1024 resolution with and without
``jax.checkpoint`` around the model forward, and prints XLA's memory
analysis (temp allocations = live activations). No execution — safe to
run alongside nothing; compiles on the TPU server.

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_remat_memory.py
"""

from __future__ import annotations

import json
import os

import numpy as np


def main():
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.config import Config
    from arflow_tpu.losses import get_loss
    from arflow_tpu.models import get_model

    B, H, W = 4, 448, 1024
    rng = np.random.RandomState(0)
    im1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    model = get_model(Config({
        "type": "uflow", "feature_norm": True, "level_dropout": 0.0,
    }))
    loss = get_loss(Config({
        "type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
        "smooth_order": 1, "edge_constant": 150.0, "with_bk": True,
    }))
    tx = optax.adam(1e-4)
    variables = jax.jit(lambda r: model.init(r, im1, im2, with_bk=True))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    opt = tx.init(params)

    def fwd(p, a, b):
        return model.apply({"params": p}, a, b, with_bk=True)

    pol = jax.checkpoint_policies
    variants = {
        "remat0": fwd,
        "remat1": jax.checkpoint(fwd),
        "remat_dots": jax.checkpoint(fwd, policy=pol.dots_saveable),
        "remat_dots_nobatch": jax.checkpoint(
            fwd, policy=pol.dots_with_no_batch_dims_saveable),
        # per-direction remat: two checkpointed one-direction passes
        "remat_per_dir": None,  # built below
    }

    def fwd_one(p, a, b):
        return model.apply({"params": p}, a, b, with_bk=False)["flows_fw"]

    fwd_one_ckpt = jax.checkpoint(fwd_one)

    def fwd_per_dir(p, a, b):
        return {
            "flows_fw": fwd_one_ckpt(p, a, b),
            "flows_bw": fwd_one_ckpt(p, b, a),
        }

    variants["remat_per_dir"] = fwd_per_dir

    # The capability demo: does b8 full-res fit a 16 GB chip?
    im1_8 = jnp.asarray(rng.rand(8, H, W, 3).astype(np.float32))
    im2_8 = jnp.asarray(rng.rand(8, H, W, 3).astype(np.float32))
    variants_b8 = {
        "b8_remat0": (fwd, im1_8, im2_8),
        "b8_remat_dots": (
            jax.checkpoint(fwd, policy=pol.dots_saveable), im1_8, im2_8),
    }

    all_variants = {k: (f, im1, im2) for k, f in variants.items()}
    all_variants.update(variants_b8)

    for name, (f, a_in, b_in) in all_variants.items():
        def step(p, o, a, b, _f=f):
            def lf(pp):
                return loss(_f(pp, a, b), a, b)["total"]

            l, g = jax.value_and_grad(lf)(p)
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2, l

        try:
            compiled = (
                jax.jit(step, donate_argnums=(0, 1))
                .lower(params, opt, a_in, b_in)
                .compile()
            )
            ma = compiled.memory_analysis()
            if isinstance(ma, (list, tuple)):
                ma = ma[0]
            row = {
                "metric": f"uflow_train_448x1024_{name}"
                if name.startswith("b8") else
                f"uflow_train_448x1024_b{B}_{name}",
                "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
                "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
                "total_mb": round(
                    (ma.temp_size_in_bytes + ma.argument_size_in_bytes)
                    / 2**20, 1),
            }
        except Exception as e:  # noqa: BLE001
            row = {"metric": name, "error": str(e)[:200]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
