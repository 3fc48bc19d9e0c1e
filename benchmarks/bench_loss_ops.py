#!/usr/bin/env python
"""Isolated fwd+grad micro-bench of the uflow loss building blocks.

Times each hot op of the census data-loss pipeline at the exact shapes the
b8 256x448 uflow train step uses (loss runs both directions batched at 2B,
so B here is 16). Sub-RTT ops are timed by iterating them ITERS times
inside one jitted lax.scan (data-dependent carry so nothing folds away),
which amortizes the ~30-40 ms tunnel RTT to noise. Gradients are taken
wrt the arguments that actually carry gradient in the train step (the
warp source is stop_gradient'ed there, so grad flows through coords only).
Run ALONE on the TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_loss_ops.py

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import time

import numpy as np

ITERS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

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

    def timed(f, *a, reps=7):
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
    m2 = jnp.asarray(rng.rand(B, H2, W2, 1).astype(np.float32))
    rtt = timed(trivial, img1)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}))

    def scan_time(fn, diff_arg, *args):
        """Per-iteration fwd and fwd+grad time of fn, scan-amortized.

        ``diff_arg`` is the positional index of the argument to
        differentiate (the one that carries gradient in the train step).
        """

        def perturbed(args, c):
            return [
                a + c * 1e-12 if i == diff_arg else a
                for i, a in enumerate(args)
            ]

        @jax.jit
        def run_fwd(*args):
            def body(c, _):
                return c + jnp.sum(fn(*perturbed(args, c))) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        @jax.jit
        def run_grad(*args):
            def body(c, _):
                # The eval point must depend on the carry or XLA hoists the
                # whole grad computation out of the scan (computed once).
                x0 = args[diff_arg] + c * 1e-12
                val, g = jax.value_and_grad(
                    lambda x: jnp.sum(
                        fn(*[x if i == diff_arg else a
                             for i, a in enumerate(args)])
                    )
                )(x0)
                return c + (val + jnp.sum(g)) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        t_f = (timed(run_fwd, *args) - rtt) / ITERS
        t_g = (timed(run_grad, *args) - rtt) / ITERS
        return t_f, t_g

    rows = []

    # full-res bilinear warp; grad wrt FLOW only (source is stop_gradient'ed
    # in the loss, losses/uflow.py) — backward is more gathers, no scatter.
    t_f, t_g = scan_time(
        lambda fl, im: resample(lax.stop_gradient(im), flow_to_warp(fl)),
        0, flow, img2,
    )
    rows.append(("warp_fullres_dflow", t_f, t_g))

    # same but grad wrt the SOURCE image (scatter-add transpose) — what a
    # loss without stop_gradient would pay; not on the training path.
    t_f, t_g = scan_time(
        lambda im, fl: resample(im, flow_to_warp(fl)), 0, img2, flow
    )
    rows.append(("warp_fullres_dsource", t_f, t_g))

    # census loss; grad wrt image_b (the warped reconstruction).
    t_f, t_g = scan_time(
        lambda b, a, m: census_mod.census_loss(a, b, m), 0, img2, img1, mask
    )
    rows.append(("census_loss_db", t_f, t_g))

    # census transform alone (one image).
    t_f, t_g = scan_time(
        lambda a: census_mod.census_transform(a), 0, img1
    )
    rows.append(("census_transform_1img", t_f, t_g))

    # range-map occlusion at level 2 (2B batch like the loss).
    t_f, t_g = scan_time(lambda fl: compute_range_map(fl), 0, flow2)
    rows.append(("range_map_l2", t_f, t_g))

    # x4 bilinear upsample of the level-2 occlusion mask to level 0.
    t_f, t_g = scan_time(lambda m: resize_bilinear(m, (H, W)), 0, m2)
    rows.append(("upsample_mask_x4", t_f, t_g))

    for name, t_f, t_g in rows:
        print(json.dumps({
            "metric": f"lossop_{name}",
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd+grad_ms": round(t_g * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
