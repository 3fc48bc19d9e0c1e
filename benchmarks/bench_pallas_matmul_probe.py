#!/usr/bin/env python
"""Can a hand-tiled Pallas matmul beat XLA at the model's conv shapes?

bench_matmul_probe.py measured XLA's own matmuls at the im2col shapes of
this model's convs: 23 TF/s at (983k, 288, 32) [thin-N pyramid conv],
65 at N=128, 88 at the decoder's (123k, 4194, 128), vs 182-189 on big
square matmuls. If a simple M-tiled Pallas matmul (weights resident in
VMEM, f32 accumulator per tile) beats those, a fused Pallas conv kernel
for the pyramid/decoder/refinement stacks is worth building; if it only
matches XLA, the wall is the shape, not the emitter.

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_pallas_matmul_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

PEAK = 197.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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

    def chained(fn, chain, *args):
        @jax.jit
        def run(*a):
            def body(c, _):
                perturbed = a[0] + c.astype(a[0].dtype) * jnp.asarray(
                    1e-12, a[0].dtype
                )
                out = fn(perturbed, *a[1:])
                return c + jnp.sum(out).astype(jnp.float32) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=chain)
            return c

        return (timed(run, *args) - rtt) / chain

    def report(name, ms, flops):
        tf = flops / ms / 1e12
        print(json.dumps({
            "metric": name, "ms": round(ms * 1e3, 3),
            "tflops_per_s": round(tf, 2),
            "pct_of_bf16_peak": round(100 * tf / PEAK, 1),
        }), flush=True)

    def pallas_matmul(x, w, tile_m):
        m, k = x.shape
        _, n = w.shape

        def kern(x_ref, w_ref, o_ref):
            o_ref[:] = jnp.dot(
                x_ref[:], w_ref[:], preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)

        return pl.pallas_call(
            kern,
            grid=(m // tile_m,),
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        )(x, w)

    # (name, M, K, N, chain) — M rounded to tile multiples.
    cases = [
        ("pyramid_dx_im2col", 983040, 96, 96, 30),      # (th+2)W rows, 3C, 3N
        ("pyramid_full_im2col", 983040, 288, 32, 30),
        ("decoder", 122880, 4194, 128, 30),
        ("refine_dx_im2col", 122880, 384, 128, 60),
        ("square_4k", 4096, 4096, 4096, 30),
    ]
    for dt_name, dt in (("bf16", jnp.bfloat16),):
        for name, m, k, n, chain in cases:
            x = jnp.asarray(
                rng.rand(m, k).astype(np.float32) * 0.1
            ).astype(dt)
            w = jnp.asarray(
                rng.rand(k, n).astype(np.float32) * 0.1
            ).astype(dt)
            flops = 2.0 * m * k * n
            # XLA reference
            t = chained(
                lambda a, b: jnp.dot(
                    a, b, preferred_element_type=jnp.float32
                ).astype(a.dtype),
                chain, x, w)
            report(f"xla_{name}_{dt_name}", t, flops)
            for tile_m in (512, 1024, 2048):
                if m % tile_m:
                    continue
                try:
                    t = chained(
                        functools.partial(pallas_matmul, tile_m=tile_m),
                        chain, x, w)
                    report(f"pallas_{name}_tm{tile_m}_{dt_name}", t, flops)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({
                        "metric": f"pallas_{name}_tm{tile_m}_{dt_name}",
                        "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
