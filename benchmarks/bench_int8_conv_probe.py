#!/usr/bin/env python
"""Does int8 pay at the CONV level (not just pre-im2col'd matmuls)?

bench_int8_probe.py showed int8 matmuls beat bf16 by 3.4x at the pyramid's
im2col shape and 1.7x at the decoder's — but those fed pre-materialized
im2col matrices. This probe times the real candidates:

  a) bf16 lax.conv (control — what the model runs today),
  b) int8 lax.conv with int32 accumulation (does XLA use the int8 MXU?),
  c) int8 im2col-in-graph: 9 shifted slices -> concat -> int8 dot
     (the fallback if (b) doesn't lower well), including the im2col build.

Shapes = the model's measured cost centers (NHWC):
  pyramid l1 conv   (16,192,320,32)  3x3 -> 32
  pyramid stride-2  (16,384,640,16)  3x3 s2 -> 32
  decoder conv      (8,96,160,466)   3x3 -> 128
  refine d=4 conv   (8,96,160,128)   3x3 d4 -> 128   (bf16 expected to win)

Run ALONE on the TPU host:
    python benchmarks/bench_int8_conv_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np

CHAIN = 30


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

    def chained(fn, x, w):
        if x.dtype == jnp.int8:
            def perturb(v, c):
                return v + (c.astype(jnp.int32) & 1).astype(jnp.int8)
        else:
            def perturb(v, c):
                return v + c.astype(v.dtype) * jnp.asarray(1e-12, v.dtype)

        @jax.jit
        def run(x, w):
            def body(c, _):
                out = fn(perturb(x, c), w)
                return c + jnp.sum(out).astype(jnp.float32) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        return (timed(run, x, w) - rtt) / CHAIN

    def report(name, ms, flops):
        print(json.dumps({
            "metric": name, "ms": round(ms * 1e3, 3),
            "tops_per_s": round(flops / ms / 1e12, 2),
        }), flush=True)

    def conv(x, w, stride=1, dilation=1):
        return lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(
                jnp.int32 if x.dtype == jnp.int8 else jnp.float32),
        )

    def im2col_dot(x, w_mat, stride=1, dilation=1):
        # 9 shifted slices over a zero-padded input -> concat on C -> dot.
        b, h, wd, c = x.shape
        p = dilation
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        cols = []
        for dy in (-dilation, 0, dilation):
            for dx in (-dilation, 0, dilation):
                cols.append(lax.dynamic_slice(
                    xp, (0, p + dy, p + dx, 0), (b, h, wd, c)))
        patches = jnp.concatenate(cols, axis=-1)
        if stride > 1:
            patches = patches[:, ::stride, ::stride, :]
        m = patches.shape[0] * patches.shape[1] * patches.shape[2]
        out = jnp.dot(patches.reshape(m, 9 * c), w_mat,
                      preferred_element_type=jnp.int32)
        return out

    cases = [
        ("pyr_l1", (16, 192, 320, 32), 32, 1, 1),
        ("pyr_stem_s2", (16, 384, 640, 16), 32, 2, 1),
        ("decoder", (8, 96, 160, 466), 128, 1, 1),
        ("refine_d4", (8, 96, 160, 128), 128, 1, 4),
    ]
    for name, shape, n_out, stride, dil in cases:
        b, h, wd, c = shape
        m_out = (h // stride) * (wd // stride) * b
        flops = 2.0 * m_out * 9 * c * n_out

        xb = jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(jnp.bfloat16)
        wb = jnp.asarray(rng.rand(3, 3, c, n_out).astype(np.float32)).astype(jnp.bfloat16)
        report(f"{name}_conv_bf16",
               chained(lambda x, w, s=stride, d=dil: conv(x, w, s, d), xb, wb),
               flops)

        x8 = jnp.asarray(rng.randint(-127, 128, shape, dtype=np.int8))
        w8 = jnp.asarray(rng.randint(-127, 128, (3, 3, c, n_out), dtype=np.int8))
        report(f"{name}_conv_int8",
               chained(lambda x, w, s=stride, d=dil: conv(x, w, s, d), x8, w8),
               flops)

        wm8 = jnp.asarray(
            rng.randint(-127, 128, (9 * c, n_out), dtype=np.int8))
        report(f"{name}_im2col_int8",
               chained(lambda x, w, s=stride, d=dil: im2col_dot(x, w, s, d),
                       x8, wm8),
               flops)


if __name__ == "__main__":
    main()
