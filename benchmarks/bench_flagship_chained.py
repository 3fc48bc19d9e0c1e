#!/usr/bin/env python
"""Chained (scan-amortized) refresh of the two remaining single-shot rows.

BASELINE.md's timing-correction section proved single-shot scalar-fetch
numbers can mislead; this puts the last two quotable rows on the chained
methodology (bench_chained_ab.py):

  1. UFlow PWCFlow fwd @448x1024 b4 (Sintel flagship), f32 and bf16.
  2. PWCLite 3-frame fw+bw inference @448x1024 b4 (reference README
     multi-view config, pwclite_ar_mv; models/pwclite.py n_frames=3).

Run ALONE on the TPU host:

    python benchmarks/bench_flagship_chained.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CHAIN = 20
PEAK_BF16 = 197.0


def main():
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.config import Config
    from arflow_tpu.models import get_model

    rng = np.random.RandomState(0)
    B, H, W = 4, 448, 1024
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img3 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

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
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    # ---- 1. UFlow flagship @448x1024, f32 + bf16 ----
    for dt_name in ("float32", "bfloat16"):
        model = get_model(Config({"type": "uflow", "feature_norm": True,
                                  "level_dropout": 0.0, "dtype": dt_name}))
        variables = jax.jit(
            lambda r: model.init(r, img1, img2, with_bk=False)
        )(jax.random.PRNGKey(0))

        @jax.jit
        def chain(p, a, b):
            def body(c, _):
                res = model.apply({"params": p}, a + c * 1e-12, b,
                                  with_bk=False)
                return c + jnp.sum(res["flows_fw"][0]).astype(
                    jnp.float32) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        t = (timed(chain, variables["params"], img1, img2) - rtt) / CHAIN

        # FLOPs of one forward (XLA cost analysis on the single-step program).
        one = jax.jit(
            lambda p, a, b: jnp.sum(
                model.apply({"params": p}, a, b, with_bk=False)["flows_fw"][0]
            )
        )
        try:
            cost = one.lower(variables["params"], img1, img2).compile().cost_analysis()
            flops = float(cost.get("flops", 0.0))
        except Exception:
            flops = 0.0
        tflops = flops / max(t, 1e-9) / 1e12
        print(json.dumps({
            "metric": f"uflow_fwd_448x1024_b4_{dt_name}_chained",
            "ms_per_batch": round(t * 1e3, 2),
            "maps_per_s": round(B / max(t, 1e-9), 1),
            "tflops": round(tflops, 2),
            "mfu_bf16_peak": round(tflops / PEAK_BF16, 4),
        }), flush=True)

    # ---- 2. PWCLite 3-frame fw+bw @448x1024 ----
    for dt_name in ("float32", "bfloat16"):
        l_model = get_model(Config({"type": "pwclite", "n_frames": 3,
                                    "upsample": True, "reduce_dense": True,
                                    "dtype": dt_name}))
        l_vars = jax.jit(
            lambda r: l_model.init(r, img1, img2, img3, with_bk=True)
        )(jax.random.PRNGKey(0))

        @jax.jit
        def lchain(p, a, b, c3):
            def body(c, _):
                res = l_model.apply({"params": p}, a + c * 1e-12, b, c3,
                                    with_bk=True)
                out = sum(jnp.sum(fl).astype(jnp.float32)
                          for fl in res["flows_fw"])
                return c + out * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        t = (timed(lchain, l_vars["params"], img1, img2, img3) - rtt) / CHAIN
        print(json.dumps({
            "metric": f"pwclite3_fwbw_448x1024_b4_{dt_name}_chained",
            "ms_per_batch": round(t * 1e3, 2),
            "triplets_per_s": round(B / max(t, 1e-9), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
