#!/usr/bin/env python
"""A/B: subpixel context-deconv relayout in the full inference forward.

The context up-convs (ConvTranspose2dTorch 4x4/s2/p1, one per decoder
level) lower to lhs-dilated convs that multiply 12 of 16 kernel taps
against structural zeros; ARFLOW_DECONV_SUBPIX=1 computes the exact
4-tap subpixel form instead (arflow_tpu/models/layers.py _subpixel,
parity pinned by tests/test_deconv_subpixel.py). This measures the
end-to-end effect at the two headline inference shapes plus the
isolated layer, chained-scan methodology.

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_deconv_subpix_ab.py
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

    from arflow_tpu.models.layers import ConvTranspose2dTorch
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

    # -- isolated layer at the decoder-l1 shape (Sintel b4: 112x256x32) ----
    dt = jnp.bfloat16
    for b, hh, ww in ((4, 112, 256), (8, 96, 160), (1, 112, 256)):
        x = jnp.asarray(rng.rand(b, hh, ww, 32).astype(np.float32), dt)
        layer = ConvTranspose2dTorch(32, kernel_size=4, stride=2, padding=1,
                                     dtype=dt)
        lvars = jax.jit(layer.init)(jax.random.PRNGKey(0), x)
        for sub in (False, True):
            @jax.jit
            def chain(p, a, _s=sub):
                def body(c, _):
                    y = layer.apply(p, a + c * jnp.asarray(1e-12, a.dtype),
                                    subpixel=_s)
                    return c + jnp.sum(y).astype(jnp.float32) * 1e-20, None
                c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
                return c
            t = (timed(chain, lvars, x) - rtt) / CHAIN
            print(json.dumps({
                "metric": f"deconv_layer_b{b}_{hh}x{ww}_subpix{int(sub)}",
                "ms": round(t * 1e3, 3),
            }), flush=True)

    # -- end-to-end inference forward at the headline shapes ---------------
    for b, h, w, n in ((4, 448, 1024, 20), (8, 384, 640, 30), (1, 448, 1024, 30)):
        img1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        img2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        model = PWCFlow(level_dropout=0.0, feature_norm=True, dtype=dt)
        params = jax.jit(
            lambda r, _m=model: _m.init(r, img1, img2, with_bk=False)
        )(jax.random.PRNGKey(0))["params"]
        for gate in ("0", "1"):
            os.environ["ARFLOW_DECONV_SUBPIX"] = gate

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
                "metric": f"e2e_{h}x{w}_b{b}_bf16_subpix{gate}",
                "ms_per_batch": round(t * 1e3, 3),
                "maps_per_sec": round(b / t, 1),
            }), flush=True)
        del os.environ["ARFLOW_DECONV_SUBPIX"]


if __name__ == "__main__":
    main()
