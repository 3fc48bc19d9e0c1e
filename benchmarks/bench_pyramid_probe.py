#!/usr/bin/env python
"""Feature-pyramid MFU probe: why does the pyramid run at ~6% of bf16 peak?

bench_mfu_breakdown.py attributes 4.65 ms of the 17.9 ms bf16 flagship
forward to the feature pyramid (15 thin 32-out convs) at 12 TFLOP/s vs the
decoder stacks' 75. This probe isolates the per-conv ceiling and tests the
layout hypotheses:

  - full pyramid (bf16 and f32) at the bench shape (2B=16, 384x640)
  - ONE 32->32 3x3 conv at the l0 shape — the per-conv achievable rate
  - the same conv at 64/128 output channels — N-lane-utilization scaling
    (if rate/FLOP is flat in N, the 32-lane padding hypothesis is wrong)
  - the 3->32 stride-2 stem conv (K=27) alone
  - a space-to-depth stem: 4x4 s2d then 32-out 1x1-ish (K=768) — timing
    only, to bound what an exact re-layout of the stem could buy

Run ALONE on the TPU host: python benchmarks/bench_pyramid_probe.py
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

    from arflow_tpu.models.uflow import PWCFeaturePyramid

    rng = np.random.RandomState(0)
    B2, H, W = 16, 384, 640  # 2B images, the bench shape
    x_in = jnp.asarray(rng.rand(B2, H, W, 3).astype(np.float32))

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

    rtt = timed(trivial, x_in)
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    def chained(fn, *args):
        @jax.jit
        def run(*a):
            def body(c, _):
                # keep the perturbed input in ITS dtype (bf16 + f32 would
                # promote and break same-dtype conv calls)
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

    # -- full pyramid, bf16 and f32 (thin-N workaround OFF: baseline) ------
    os.environ["ARFLOW_CONV_NPAD"] = "0"
    pyr_flops = 0
    h, w, cin = H, W, 3
    for _ in range(5):
        h, w = h // 2, w // 2
        pyr_flops += 2 * 9 * h * w * (cin * 32 + 32 * 32 + 32 * 32)
        cin = 32
    pyr_flops *= B2

    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", None)):
        pyr = PWCFeaturePyramid(dtype=dt)
        pvars = jax.jit(lambda r: pyr.init(r, x_in))(jax.random.PRNGKey(0))
        t = chained(lambda a, p, m=pyr: m.apply({"params": p}, a)[-1],
                    x_in, pvars["params"])
        report(f"pyramid_{dt_name}", t, pyr_flops)

    # -- isolated convs at the l0 shape (192x320) --------------------------
    hh, ww = H // 2, W // 2
    f32x = jnp.asarray(rng.rand(B2, hh, ww, 32).astype(np.float32))
    for n_out in (32, 64, 128):
        k = jnp.asarray(
            rng.randn(3, 3, 32, n_out).astype(np.float32) * 0.1)
        for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            xx = f32x.astype(dt)
            kk = k.astype(dt)
            flops = 2 * 9 * hh * ww * 32 * n_out * B2
            t = chained(
                lambda a, w_: lax.conv_general_dilated(
                    a, w_, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")),
                xx, kk)
            report(f"conv32to{n_out}_192x320_{dt_name}", t, flops)

    # -- the 3->32 stride-2 stem at 384x640 --------------------------------
    k_stem = jnp.asarray(rng.randn(3, 3, 3, 32).astype(np.float32) * 0.1)
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        xx = x_in.astype(dt)
        kk = k_stem.astype(dt)
        flops = 2 * 9 * (H // 2) * (W // 2) * 3 * 32 * B2
        t = chained(
            lambda a, w_: lax.conv_general_dilated(
                a, w_, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")),
            xx, kk)
        report(f"stem3to32_s2_{dt_name}", t, flops)

    # -- space-to-depth stem bound: 2x2 s2d + 2x2 conv (K=48) --------------
    # An exact re-layout of the 3x3/s2 stem is a 2x2 conv over 2x2-s2d
    # input (12 channels, 9/16 taps structurally nonzero). Time the dense
    # version to bound the win.
    k_s2d = jnp.asarray(rng.randn(2, 2, 12, 32).astype(np.float32) * 0.1)
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        xx = x_in.astype(dt)
        kk = k_s2d.astype(dt)

        def s2d_conv(a, w_):
            b, h_, w2_, c = a.shape
            a = a.reshape(b, h_ // 2, 2, w2_ // 2, 2, c)
            a = a.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h_ // 2, w2_ // 2, 4 * c)
            return lax.conv_general_dilated(
                a, w_, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        flops = 2 * 4 * (H // 2) * (W // 2) * 12 * 32 * B2
        t = chained(s2d_conv, xx, kk)
        report(f"stem_s2d_2x2conv_{dt_name}", t, flops)

    # -- bf16 N=32 pathology workarounds (round-3 second wave) -------------
    # conv32to64 bf16 runs 2.5x FASTER than conv32to32 bf16 (N<=64 is free
    # on the MXU; XLA's bf16 emitter mishandles N=32). Probe: (a) the same
    # 32->32 conv with the kernel zero-padded to 64 outputs + slice, (b) the
    # conv computed in f32 inside a bf16 graph.
    k32 = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.1)
    xbf = f32x.astype(jnp.bfloat16)
    flops32 = 2 * 9 * hh * ww * 32 * 32 * B2

    def conv_n64pad(a, w_):
        wp = jnp.pad(w_, ((0, 0), (0, 0), (0, 0), (0, 32)))
        y = lax.conv_general_dilated(
            a, wp.astype(a.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[..., :32]

    t = chained(conv_n64pad, xbf, k32)
    report("conv32to32_n64pad_bf16", t, flops32)

    def conv_f32(a, w_):
        y = lax.conv_general_dilated(
            a.astype(jnp.float32), w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.astype(jnp.bfloat16)

    t = chained(conv_f32, xbf, k32)
    report("conv32to32_f32_in_bf16_graph", t, flops32)

    # -- full pyramid with the N64-pad workaround (ARFLOW_CONV_NPAD) -------
    os.environ["ARFLOW_CONV_NPAD"] = "1"
    pyr = PWCFeaturePyramid(dtype=jnp.bfloat16)
    pvars = jax.jit(lambda r: pyr.init(r, x_in))(jax.random.PRNGKey(0))
    t = chained(lambda a, p, m=pyr: m.apply({"params": p}, a)[-1],
                x_in, pvars["params"])
    report("pyramid_bf16_npad", t, pyr_flops)
    del os.environ["ARFLOW_CONV_NPAD"]

    # -- one level-0 triple-conv stack (stem + 2x 32->32) as one program ---
    import flax.linen as nn
    from arflow_tpu.models.layers import conv2d, leaky_relu

    class Level0(nn.Module):
        dt: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            x = conv2d(32, 3, stride=2, dtype=self.dt)(x)
            x = leaky_relu(x, 0.2)
            x = conv2d(32, 3, dtype=self.dt)(x)
            x = leaky_relu(x, 0.2)
            x = conv2d(32, 3, dtype=self.dt)(x)
            return leaky_relu(x, 0.2)

    l0 = Level0()
    lvars = jax.jit(l0.init)(jax.random.PRNGKey(0), x_in)
    flops = 2 * 9 * (H // 2) * (W // 2) * (3 * 32 + 32 * 32 + 32 * 32) * B2
    t = chained(lambda a, p: l0.apply(p, a), x_in, lvars)
    report("level0_stack_bf16", t, flops)


if __name__ == "__main__":
    main()
