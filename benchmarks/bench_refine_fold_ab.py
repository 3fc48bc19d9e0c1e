#!/usr/bin/env python
"""A/B: H-folded dilated refinement stack in the full inference forward.

Round-5 closes the round-4 leftover: the dilated refinement stack
(6 convs, dilations 1..16, at the 1/4-res output level —
/root/reference/models/uflow_model.py:325-348) now rides the H-fold with
per-conv halo = dilation rows (arflow_tpu/models/uflow.py; exact fwd+grad
parity in tests/test_hfold.py). ARFLOW_HFOLD_REFINE=0 disables ONLY the
refinement fold (the decoder fold keeps its default), so this measures
the refinement fold's end-to-end contribution at the small-batch shapes
where the b<8 conv cliff bites. Chained methodology.

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_refine_fold_ab.py
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

    rtt = timed(trivial, jnp.zeros((4,), jnp.float32))
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    dt = jnp.bfloat16
    for b, h, w, n in ((4, 448, 1024, 20), (1, 448, 1024, 30), (8, 384, 640, 30)):
        img1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        img2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        model = PWCFlow(level_dropout=0.0, feature_norm=True, dtype=dt)
        params = jax.jit(
            lambda r, _m=model: _m.init(r, img1, img2, with_bk=False)
        )(jax.random.PRNGKey(0))["params"]
        for gate in ("8", "0"):  # default target vs fold disabled
            os.environ["ARFLOW_HFOLD_REFINE"] = gate

            @jax.jit
            def chain(p, a, bb, _m=model, _n=n):
                def body(c, _):
                    out = _m.apply({"params": p}, a + c * 1e-12, bb,
                                   with_bk=False)["flows_fw"][0]
                    return c + jnp.sum(out) * 1e-20, None
                c, _ = lax.scan(body, jnp.float32(0.0), None, length=_n)
                return c

            t = (timed(chain, params, img1, img2) - rtt) / n
            print(json.dumps({
                "metric": f"e2e_{h}x{w}_b{b}_bf16_refinefold{gate}",
                "ms_per_batch": round(t * 1e3, 3),
                "maps_per_sec": round(b / t, 1),
            }), flush=True)
        del os.environ["ARFLOW_HFOLD_REFINE"]


if __name__ == "__main__":
    main()
