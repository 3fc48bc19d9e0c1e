#!/usr/bin/env python
"""Isolated fwd+grad micro-bench of the uflow loss building blocks.

Times each hot op of the census data-loss pipeline at the exact shapes the
b8 256x448 uflow train step uses (loss runs both directions batched at 2B,
so B here is 16): full-res bilinear warp, census loss, range-map occlusion
at level 2, and the x4 upsample. Gives the per-op breakdown that the
DCE-probe rows in bench_train_profile.py can't. Run ALONE on the TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_loss_ops.py

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.ops import census as census_mod
    from arflow_tpu.ops.warp import flow_to_warp, resample
    from arflow_tpu.ops.occlusion import compute_range_map
    from arflow_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    B, H, W = 16, 256, 448  # 2B of the b8 train step (fw+bw batched)
    H2, W2 = H // 4, W // 4

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

    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    flow = jnp.asarray((rng.randn(B, H, W, 2) * 3).astype(np.float32))
    flow2 = jnp.asarray((rng.randn(B, H2, W2, 2) * 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    rtt = timed(trivial, img1)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}))

    def fwd_and_grad(fn, *args, wrt=(0,)):
        @jax.jit
        def f(*a):
            return jnp.sum(fn(*a))

        @jax.jit
        def g(*a):
            val, grads = jax.value_and_grad(
                lambda *x: jnp.sum(fn(*x)), argnums=wrt
            )(*a)
            return val + sum(jnp.sum(gr) for gr in grads)

        return timed(f, *args) - rtt, timed(g, *args) - rtt

    rows = []

    # full-res bilinear warp (the loss warps img2 by the level-0 flow)
    t_f, t_g = fwd_and_grad(
        lambda im, fl: resample(im, flow_to_warp(fl)), img2, flow, wrt=(0, 1)
    )
    rows.append(("warp_fullres", t_f, t_g))

    # census loss between img1 and a plain tensor (stand-in for the warp)
    t_f, t_g = fwd_and_grad(
        lambda a, b: census_mod.census_loss(a, b, mask), img1, img2, wrt=(0, 1)
    )
    rows.append(("census_loss", t_f, t_g))

    # census transform alone (one image)
    t_f, t_g = fwd_and_grad(
        lambda a: census_mod.census_transform(a), img1, wrt=(0,)
    )
    rows.append(("census_transform_1img", t_f, t_g))

    # range-map occlusion at level 2 (where the uflow loss computes it)
    t_f, t_g = fwd_and_grad(lambda fl: compute_range_map(fl), flow2, wrt=(0,))
    rows.append(("range_map_l2", t_f, t_g))

    # x4 bilinear upsample of the level-2 occlusion mask to level 0
    m2 = jnp.asarray(rng.rand(B, H2, W2, 1).astype(np.float32))
    t_f, t_g = fwd_and_grad(
        lambda m: resize_bilinear(m, (H, W)), m2, wrt=(0,)
    )
    rows.append(("upsample_mask_x4", t_f, t_g))

    for name, t_f, t_g in rows:
        print(json.dumps({
            "metric": f"lossop_{name}",
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd+grad_ms": round(t_g * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
