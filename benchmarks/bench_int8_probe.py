#!/usr/bin/env python
"""Can int8 MXU throughput beat the measured bf16 conv wall?

bench_matmul_probe.py established a ~43-45% wall for the model's tall-skinny
conv/matmul shapes in bf16 (M*K pass-bound). The v5e MXU advertises ~2x the
bf16 rate for int8 — IF the shapes can use it, a quantized serving mode
would be worth building. This probe times the same im2col shapes with int8
inputs (int32 accumulation) against same-run bf16, plus a square control.

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_int8_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np

CHAIN = 30
PEAK_BF16 = 197.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    rtt = timed(trivial, jnp.zeros((8, 128), jnp.float32))
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    def chained(fn, a, b):
        # Data-dependent perturbation of `a` keeps the matmul inside the scan.
        if a.dtype == jnp.int8:
            def perturb(x, c):
                return x + (c.astype(jnp.int32) & 1).astype(jnp.int8)
        else:
            def perturb(x, c):
                return x + c.astype(x.dtype) * jnp.asarray(1e-12, x.dtype)

        @jax.jit
        def run(a, b):
            def body(c, _):
                out = fn(perturb(a, c), b)
                return c + jnp.sum(out).astype(jnp.float32) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        return (timed(run, a, b) - rtt) / CHAIN

    def report(name, ms, flops):
        tf = flops / ms / 1e12
        print(json.dumps({
            "metric": name, "ms": round(ms * 1e3, 3),
            "tops_per_s": round(tf, 2),
            "x_of_bf16_peak": round(tf / PEAK_BF16, 2),
        }), flush=True)

    cases = [
        ("im2col_l0conv", 16 * 192 * 320, 288, 32),
        ("im2col_l0conv_n128", 16 * 192 * 320, 288, 128),
        ("im2col_refine", 8 * 96 * 160, 1152, 128),
        ("im2col_decoder", 8 * 96 * 160, 9 * 466, 128),
        ("square_4k", 4096, 4096, 4096),
    ]
    for name, m, k, n in cases:
        flops = 2.0 * m * k * n
        a8 = jnp.asarray(rng.randint(-127, 128, (m, k), dtype=np.int8))
        b8 = jnp.asarray(rng.randint(-127, 128, (k, n), dtype=np.int8))
        t = chained(
            lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.int32),
            a8, b8)
        report(f"{name}_int8", t, flops)

        ab = jnp.asarray(rng.rand(m, k).astype(np.float32) * 0.1).astype(jnp.bfloat16)
        bb = jnp.asarray(rng.rand(k, n).astype(np.float32) * 0.1).astype(jnp.bfloat16)
        t = chained(
            lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
            ab, bb)
        report(f"{name}_bf16", t, flops)


if __name__ == "__main__":
    main()
