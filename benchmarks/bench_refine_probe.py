#!/usr/bin/env python
"""Refinement-stack probe: are XLA's dilated convs the 14%-of-peak culprit?

bench_mfu_breakdown.py attributes 4.64 ms of the bf16 flagship forward to
the dilated refinement stack (27.5 TFLOP/s = 14% of peak) vs the dense-net
decoders' 38-44%. Hypotheses probed, each chained (lax.scan, CHAIN reps):

  1. one 3x3 conv 128->128 @96x160 b8, dilation 1 vs 2 vs 4 vs 8 vs 16 —
     if TF/s collapses with dilation, XLA's dilated lowering is the gap.
  2. the same dilated conv as a PHASE RE-LAYOUT: space-to-depth by (d,d)
     into d^2 subgrid images, dense 3x3 (pad 1) per subgrid, inverse s2d.
     Exact numerics (dilated taps never cross subgrids; pad d == per-phase
     pad 1). If (2) beats (1) at d=8/16, the re-layout is a refinement win.
  3. the full refinement stack as-is, f32 and bf16, for attribution.

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_refine_probe.py
"""

from __future__ import annotations

import json
import os
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
    B, H, W, C = 8, 96, 160, 128
    x0 = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

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

    rtt = timed(trivial, x0)
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

    def report(name, ms, flops=None):
        row = {"metric": name, "ms": round(ms * 1e3, 3)}
        if flops:
            row["tflops_per_s"] = round(flops / ms / 1e12, 2)
            row["pct_of_bf16_peak"] = round(100 * flops / ms / 1e12 / PEAK, 1)
        print(json.dumps(row), flush=True)

    k = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
    conv_flops = 2 * 9 * H * W * C * C * B

    def dilated(a, w_, d):
        return lax.conv_general_dilated(
            a, w_, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def phase_relayout(a, w_, d):
        b, h, w2, c = a.shape
        # s2d by (d, d): (b, h/d, d, w/d, d, c) -> (b*d*d, h/d, w/d, c)
        a = a.reshape(b, h // d, d, w2 // d, d, c)
        a = a.transpose(0, 2, 4, 1, 3, 5).reshape(
            b * d * d, h // d, w2 // d, c)
        y = lax.conv_general_dilated(
            a, w_, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, d, d, h // d, w2 // d, -1)
        return y.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w2, -1)

    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        xx = x0.astype(dt)
        kk = k.astype(dt)
        for d in (1, 2, 4, 8, 16):
            t = chained(lambda a, w_, _d=d: dilated(a, w_, _d), xx, kk)
            report(f"conv128_d{d}_{dt_name}", t, conv_flops)
            if d > 1:
                # parity check once per (d, dtype) on tiny data
                small = xx[:1, : 2 * d * 3, : 2 * d * 3]
                ref = dilated(small, kk, d)
                alt = phase_relayout(small, kk, d)
                err = float(jnp.max(jnp.abs(
                    ref.astype(jnp.float32) - alt.astype(jnp.float32))))
                t2 = chained(
                    lambda a, w_, _d=d: phase_relayout(a, w_, _d), xx, kk)
                report(f"conv128_d{d}_phase_relayout_{dt_name}", t2,
                       conv_flops)
                print(json.dumps({
                    "metric": f"relayout_parity_d{d}_{dt_name}",
                    "max_abs_err": err}), flush=True)

    # Full refinement stack as the model builds it.
    import flax.linen as nn
    from arflow_tpu.models.layers import conv2d

    filters = ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))

    class Refine(nn.Module):
        dt: object = None

        @nn.compact
        def __call__(self, x):
            for j, (c, d) in enumerate(filters):
                x = conv2d(c, 3, dilation=d, name=f"refine_{j}",
                           dtype=self.dt)(x)
                x = jax.nn.leaky_relu(x, 0.1)
            return conv2d(2, 3, name="refine_out", dtype=self.dt)(x)

    xin = jnp.asarray(rng.rand(B, H, W, 34).astype(np.float32))
    stack_flops = 0
    cin = 34
    for c, _ in filters:
        stack_flops += 2 * 9 * H * W * cin * c * B
        cin = c
    stack_flops += 2 * 9 * H * W * cin * 2 * B

    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", None)):
        m = Refine(dt=dt)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), xin)
        t = chained(lambda a, p: m.apply(p, a), xin, v)
        report(f"refine_stack_{dt_name}", t, stack_flops)


if __name__ == "__main__":
    main()
