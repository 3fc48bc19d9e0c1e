#!/usr/bin/env python
"""Probe: is the dense-net decoder conv stack's throughput shape-sensitive?

The round-4 Sintel-res MFU attribution (bench_mfu_breakdown.py --shape
4,448,1024) measured the level-1 decoder stack at b4 112x256 running at
~32 TF/s while the SAME-FLOP b8 96x160 stack (384x640 bench shape) runs at
~75-86 TF/s. This probe times the identical DecoderConvs module at a grid
of (B, H, W) layouts with near-constant M = B*H*W to separate genuine
XLA/Mosaic conv-tiling sensitivity from measurement artifacts, plus a
space-to-batch variant (H halved into batch, halo-less approximation) to
see what a relayout could buy. Run ALONE on the host (one TPU client).
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
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.models.layers import conv2d, leaky_relu

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    class DecoderConvs(nn.Module):
        @nn.compact
        def __call__(self, x_in):
            x_out = None
            for c in (128, 128, 96, 64, 32):
                x_out = leaky_relu(conv2d(c, 3, dtype=dt)(x_in), 0.1)
                x_in = jnp.concatenate([x_in, x_out], axis=-1)
            return conv2d(2, 3, dtype=dt)(x_out)

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

    cin = 32 + 2 + 81 + 32

    def flops_of(b, h, w):
        fl, ci = 0, cin
        for c in (128, 128, 96, 64, 32):
            fl += 2 * 9 * h * w * ci * c
            ci += c
        fl += 2 * 9 * h * w * 32 * 2
        return fl * b

    warm = jnp.asarray(rng.rand(4, 112, 256, cin).astype(np.float32), dt)
    rtt = timed(trivial, warm)

    shapes = [
        (4, 112, 256),   # Sintel-res l1 (the slow reading)
        (8, 96, 160),    # 384x640-bench l1 (the fast reading)
        (8, 112, 128),   # same M as Sintel via batch-doubling
        (16, 56, 256),   # same M, H halved into batch
        (4, 224, 128),   # same M, W halved into H
        (1, 448, 256),   # same M, all-spatial
        (32, 56, 64),    # same M as 384-bench via batch
    ]
    for b, h, w in shapes:
        x = jnp.asarray(rng.rand(b, h, w, cin).astype(np.float32), dt)
        dec = DecoderConvs()
        dvars = jax.jit(dec.init)(jax.random.PRNGKey(0), x)

        @jax.jit
        def run(a, p, _d=dec):
            def body(c, _):
                o = _d.apply(p, a + c * jnp.asarray(1e-12, a.dtype))
                return c + jnp.sum(o).astype(jnp.float32) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        t = (timed(run, x, dvars) - rtt) / CHAIN
        fl = flops_of(b, h, w)
        print(json.dumps({
            "shape": f"b{b}_{h}x{w}", "m": b * h * w,
            "ms": round(t * 1e3, 3),
            "tflops_per_s": round(fl / t / 1e12, 2),
        }))


if __name__ == "__main__":
    main()
