#!/usr/bin/env python
"""A/B: H-fold decoder relayout (ARFLOW_HFOLD) on the bf16 uflow forward.

Chained-scan timing of the full PWCFlow forward at the small-batch shapes
where the b<8 conv-tiling cliff bites (bench_decoder_shape_probe.py):
Sintel-res b4 448x1024 and streaming b1. Run ALONE on the host.
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
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.models.uflow import PWCFlow

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

    for b, h, w in ((4, 448, 1024), (1, 448, 1024), (8, 384, 640)):
        img1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        img2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        model = PWCFlow(level_dropout=0.0, feature_norm=True,
                        dtype=jnp.bfloat16)
        variables = jax.jit(
            lambda r, _m=model: _m.init(r, img1, img2, with_bk=False)
        )(jax.random.PRNGKey(0))
        params = variables["params"]
        rtt = timed(trivial, img1)

        out = {"shape": f"b{b}_{h}x{w}"}
        # Round 5: also probe deeper folds (16/32) past the b>=8 cliff
        # plateau; pin the refinement fold OFF so ARFLOW_HFOLD's
        # follow-through doesn't contaminate the decoder measurement.
        os.environ["ARFLOW_HFOLD_REFINE"] = "0"
        for mode in ("0", "8", "16", "32"):
            os.environ["ARFLOW_HFOLD"] = mode

            @jax.jit
            def chain(p, a, bb, _m=model):
                def body(c, _):
                    o = _m.apply(
                        {"params": p}, a + c * 1e-12, bb, with_bk=False
                    )["flows_fw"][0]
                    return c + jnp.sum(o) * 1e-20, None

                c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
                return c

            dt = (timed(chain, params, img1, img2) - rtt) / CHAIN
            out[f"hfold{mode}_ms"] = round(dt * 1e3, 3)
            out[f"hfold{mode}_maps_per_sec"] = round(b / dt, 1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
