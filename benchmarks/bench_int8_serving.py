#!/usr/bin/env python
"""int8-pyramid serving mode: throughput A/B + trained-weights EPE impact.

The ARFLOW_INT8_PYRAMID gate (models/layers.py) swaps the feature pyramid's
convs for dynamically-quantized int8 MXU convs — measured 1.58-1.88x at the
pyramid conv shapes (bench_int8_conv_probe.py). This bench answers the two
questions that decide whether the mode ships:

1. End-to-end throughput: chained-scan A/B of the bf16 uflow forward at the
   headline shape (384x640 b8) with the gate off/on.
2. Accuracy on TRAINED weights: train the supervised known-shift task
   (tools/bf16_compare.py recipe, f32, 300 steps), then evaluate EPE with
   the gate off/on — plus max/mean flow delta on held-out pairs.

Run ALONE on the TPU host:
    python benchmarks/bench_int8_serving.py [--steps 300]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

CHAIN = 50
REPS = 5


def throughput_ab():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from arflow_tpu.models.uflow import PWCFlow

    h, w, batch = 384, 640, 8
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))

    model = PWCFlow(level_dropout=0.0, feature_norm=True, dtype=jnp.bfloat16)
    params = jax.jit(lambda r: model.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0)
    )["params"]

    @jax.jit
    def trivial(a):
        return jnp.sum(a)

    def timed(f, *a):
        float(f(*a))
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        ts = np.asarray(ts)
        return float(np.median(ts)), float((ts.max() - ts.min()) / np.median(ts))

    rtt, _ = timed(trivial, img1)
    out = {}
    for mode, gate in (("bf16", "0"), ("bf16_int8pyr", "1")):
        os.environ["ARFLOW_INT8_PYRAMID"] = gate

        @jax.jit
        def chain(p, a, b):
            def body(c, _):
                f = model.apply(
                    {"params": p}, a + c * 1e-12, b, with_bk=False
                )["flows_fw"][0]
                return c + jnp.sum(f) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        total, spread = timed(chain, params, img1, img2)
        dt = max(total - rtt, 1e-6) / CHAIN
        out[mode] = {
            "ms_per_batch": round(dt * 1e3, 3),
            "maps_per_sec": round(batch / dt, 1),
            "spread_pct": round(100 * spread, 2),
        }
        print(json.dumps({"metric": f"throughput_{mode}", **out[mode]}),
              flush=True)
    os.environ["ARFLOW_INT8_PYRAMID"] = "0"
    return out


def accuracy(steps: int):
    import jax
    import jax.numpy as jnp

    from arflow_tpu.models.uflow_prob import PWCProbFlow
    from arflow_tpu.tools.bf16_compare import make_pairs, train_one

    rng = np.random.RandomState(0)
    i1, i2, dxy = make_pairs(rng, 8)
    img1, img2 = jnp.asarray(i1), jnp.asarray(i2)
    gt = jnp.tile(jnp.asarray(dxy, jnp.float32), (8, 128, 160, 1))

    os.environ["ARFLOW_INT8_PYRAMID"] = "0"
    params, _ = train_one("f32", img1, img2, gt, dxy, steps)

    h1, h2, _ = make_pairs(np.random.RandomState(1), 4)
    h1, h2 = jnp.asarray(h1), jnp.asarray(h2)
    dx, dy = dxy

    flows = {}
    epes = {}
    for mode, gate in (("bf16", "0"), ("bf16_int8pyr", "1")):
        os.environ["ARFLOW_INT8_PYRAMID"] = gate
        m = PWCProbFlow(out_channels=(2, 2, 0), feature_norm=True,
                        dtype=jnp.bfloat16)
        f = np.asarray(
            jax.jit(
                lambda p, a, b: m.apply({"params": p}, a, b, with_bk=False)[
                    "flows_fw"][0][..., :2]
            )(params, h1, h2)
        )
        flows[mode] = f
        epes[mode] = float(
            np.mean(np.sqrt((f[..., 0] - dx) ** 2 + (f[..., 1] - dy) ** 2))
        )
    os.environ["ARFLOW_INT8_PYRAMID"] = "0"
    d = np.abs(flows["bf16_int8pyr"] - flows["bf16"])
    res = {
        "epe_bf16": round(epes["bf16"], 4),
        "epe_bf16_int8pyr": round(epes["bf16_int8pyr"], 4),
        "epe_delta": round(epes["bf16_int8pyr"] - epes["bf16"], 4),
        "flow_delta_max_px": round(float(d.max()), 4),
        "flow_delta_mean_px": round(float(d.mean()), 5),
        "accept_threshold": 0.05,
    }
    print(json.dumps({"metric": "int8pyr_trained_epe", "steps": steps, **res}),
          flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--skip-accuracy", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")

    throughput_ab()
    if not args.skip_accuracy:
        accuracy(args.steps)


if __name__ == "__main__":
    main()
