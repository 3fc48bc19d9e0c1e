#!/usr/bin/env python
"""Flagship UFlow PWCFlow inference at Sintel resolution (448x1024).

The reference README recommends 448x1024 for Sintel (README.md:50); round-1
BASELINE.md had only a PWC-Lite 3-frame row at this size. Run ALONE on the
TPU host. Prints one JSON line (maps/s + FLOPs/MFU).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.models.uflow import PWCFlow

    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    h, w, batch = 448, 1024, 4
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def trivial(a):
        return jnp.sum(a)

    @jax.jit
    def forward_reduced(params, a, b):
        out = model.apply({"params": params}, a, b, with_bk=False)["flows_fw"][0]
        return jnp.sum(out)

    def timed(f, *a, reps=10):
        float(f(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    rtt = timed(trivial, img1)
    fwd = timed(forward_reduced, variables["params"], img1, img2)
    dt = max(fwd - rtt, 1e-6)

    PEAK_TFLOPS = 197.0
    extra = {}
    try:
        an = (
            forward_reduced.lower(variables["params"], img1, img2)
            .compile()
            .cost_analysis()
        )
        if isinstance(an, (list, tuple)):
            an = an[0]
        flops = float(an.get("flops", 0.0))
        if flops:
            tflops_s = flops / dt / 1e12
            extra = {
                "program_gflops_per_batch": round(flops / 1e9, 1),
                "tflops_per_s": round(tflops_s, 2),
                "mfu_pct_of_bf16_peak": round(100 * tflops_s / PEAK_TFLOPS, 2),
            }
    except Exception:
        pass

    # Scan-amortized cross-check (ITERS fwd passes inside one lax.scan —
    # drowns the tunnel's fetch jitter) + the bf16 row at Sintel res.
    from jax import lax

    ITERS = 10

    def scan_fwd(m, v):
        @jax.jit
        def run(v, a, b):
            def body(c, _):
                out = m.apply(v, a + c * 1e-12, b, with_bk=False)
                return (
                    c + jnp.sum(out["flows_fw"][0].astype(jnp.float32)) * 1e-20,
                    None,
                )

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        return (timed(run, v, img1, img2) - rtt) / ITERS

    t_scan = scan_fwd(model, variables)
    extra["scan_amortized_maps_per_sec"] = round(batch / max(t_scan, 1e-9), 3)
    model_bf16 = PWCFlow(level_dropout=0.0, feature_norm=True,
                         dtype=jnp.bfloat16)
    t16 = scan_fwd(model_bf16, variables)
    extra["bf16_maps_per_sec"] = round(batch / max(t16, 1e-9), 3)

    print(json.dumps({
        "metric": "uflow_inference_448x1024_maps_per_sec",
        "value": round(batch / dt, 3),
        "unit": "flow_maps/s",
        "batch": batch,
        **extra,
    }))


if __name__ == "__main__":
    main()
