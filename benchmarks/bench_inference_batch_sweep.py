#!/usr/bin/env python
"""Batch-size sweep for the headline inference program (uflow @384x640).

Throughput-optimal batch on one chip: chained-scan timing per batch size,
f32 and bf16, Pallas cost volume on (the bench.py configuration). Round-2
note: training measured b8 optimal (9.7 ms/sample at b16 vs 8.8 at b8);
inference (forward-only, pyramid-batched) may peak elsewhere.

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_inference_batch_sweep.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CHAIN = 30


def main():
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.models.uflow import PWCFlow

    h, w = 384, 640
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

    warm = jnp.zeros((1,), jnp.float32)
    rtt = timed(trivial, warm)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        model = PWCFlow(level_dropout=0.0, feature_norm=True, dtype=dt)
        for batch in (4, 8, 16, 32):
            img1 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
            img2 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
            variables = jax.jit(
                lambda r, a, b: model.init(r, a, b, with_bk=False)
            )(jax.random.PRNGKey(0), img1, img2)

            @jax.jit
            def chain(p, a, b):
                def body(c, _):
                    out = model.apply(
                        {"params": p}, a + c * 1e-12, b, with_bk=False
                    )["flows_fw"][0]
                    return c + jnp.sum(out) * 1e-20, None

                c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
                return c

            t = (timed(chain, variables["params"], img1, img2) - rtt) / CHAIN
            print(json.dumps({
                "metric": f"uflow_fwd_384x640_{dt_name}_b{batch}",
                "ms_per_batch": round(t * 1e3, 2),
                "maps_per_s": round(batch / max(t, 1e-9), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
