#!/usr/bin/env python
"""Per-LEVEL feature-pyramid attribution: where do the 4.8 ms actually go?

Round 3 established the pyramid's structural wall (M*K pass-bound convs,
N=32 free lanes — BASELINE.md "MFU ceiling analysis") but left ~45% of the
structural bound unattributed, hypothesized as "upper levels' spatial
extents shrink below tile size". This probe times each level's 3-conv
stack standalone (chained scan) at the three headline shapes so the gap
can be located:

  - if levels 2-4 (tiny M: 61k/15k/3.8k rows) take disproportionate time,
    they are launch-floor/tile-quantization-bound and a fused kernel (all
    convs of the small levels in one program, VMEM-resident) is the fix;
  - if level 0-1 dominate proportionally, the wall story holds and the
    remaining lever is K-padding waste (288 -> 384 lanes = 25%).

Run ALONE on the TPU host: python benchmarks/bench_pyramid_levels_probe.py
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

    import flax.linen as nn

    from arflow_tpu.models.layers import conv2d, leaky_relu

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

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

    def report(name, ms, flops=None):
        row = {"metric": name, "ms": round(ms * 1e3, 3)}
        if flops:
            row["tflops_per_s"] = round(flops / ms / 1e12, 2)
            row["pct_of_bf16_peak"] = round(100 * flops / ms / 1e12 / PEAK, 1)
        print(json.dumps(row), flush=True)

    class LevelStack(nn.Module):
        """One pyramid level: stride-2 stem conv + two stride-1 convs."""

        cin: int

        @nn.compact
        def __call__(self, x):
            x = leaky_relu(conv2d(32, 3, stride=2, dtype=dt)(x), 0.1)
            x = leaky_relu(conv2d(32, 3, dtype=dt)(x), 0.1)
            return leaky_relu(conv2d(32, 3, dtype=dt)(x), 0.1)

    # 2B images at the three headline shapes.
    for b2, H, W in ((16, 384, 640), (8, 448, 1024), (2, 448, 1024)):
        x = jnp.asarray(rng.rand(b2, H, W, 3).astype(np.float32), dt)
        rtt = timed(trivial, x)
        total = 0.0
        cin = 3
        for level in range(5):
            h_out, w_out = x.shape[1] // 2, x.shape[2] // 2
            stack = LevelStack(cin=cin)
            svars = jax.jit(stack.init)(jax.random.PRNGKey(0), x)
            flops = (
                2 * 9 * h_out * w_out * (cin * 32 + 32 * 32 + 32 * 32) * b2
            )
            t = chained(lambda a, p, s=stack: s.apply(p, a), x, svars)
            total += t
            report(f"2B{b2}_{H}x{W}_level{level}_{h_out}x{w_out}", t, flops)
            x = jnp.asarray(
                rng.rand(b2, h_out, w_out, 32).astype(np.float32), dt
            )
            cin = 32
        report(f"2B{b2}_{H}x{W}_levels_sum", total)


if __name__ == "__main__":
    main()
