#!/usr/bin/env python
"""What rate can this chip/stack actually sustain? Matmul vs conv emitter.

The pyramid/decoder probes show XLA's 3x3 convs topping out at ~75-86
TFLOP/s bf16 (38-44% of the 197 peak) even at N=128 with huge M. Is that
the conv emitter's wall or the chip's practical ceiling through this
stack? Time pure matmuls at matched M/K/N and a big square matmul.

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_matmul_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np

CHAIN = 30
PEAK = 197.0


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

    def chained(fn, *args):
        @jax.jit
        def run(*a):
            def body(c, _):
                perturbed = a[0] + c.astype(a[0].dtype) * jnp.asarray(
                    1e-12, a[0].dtype
                )
                out = fn(perturbed, *a[1:])
                return c + jnp.sum(out).astype(jnp.float32) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        return (timed(run, *args) - rtt) / CHAIN

    def report(name, ms, flops):
        tf = flops / ms / 1e12
        print(json.dumps({
            "metric": name, "ms": round(ms * 1e3, 3),
            "tflops_per_s": round(tf, 2),
            "pct_of_bf16_peak": round(100 * tf / PEAK, 1),
        }), flush=True)

    # (M, K, N): conv-equivalent shapes (im2col of the probed convs) and a
    # big square control.
    cases = [
        ("mm_im2col_l0conv", 16 * 192 * 320, 288, 32),
        ("mm_im2col_l0conv_n128", 16 * 192 * 320, 288, 128),
        ("mm_im2col_refine", 8 * 96 * 160, 1152, 128),
        ("mm_im2col_decoder", 8 * 96 * 160, 9 * 466, 128),
        ("mm_square_4k", 4096, 4096, 4096),
        ("mm_square_8k", 8192, 8192, 8192),
    ]
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for name, m, k, n in cases:
            a = jnp.asarray(rng.rand(m, k).astype(np.float32) * 0.1).astype(dt)
            b = jnp.asarray(rng.rand(k, n).astype(np.float32) * 0.1).astype(dt)
            flops = 2.0 * m * k * n
            t = chained(
                lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
                a, b)
            report(f"{name}_{dt_name}", t, flops)


if __name__ == "__main__":
    main()
