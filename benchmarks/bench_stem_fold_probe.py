#!/usr/bin/env python
"""Stem-conv relayout probe: the pyramid's level-0 wall is the 3->32 s2 stem.

bench_pyramid_levels_probe.py attributes ~4.1 ms of the ~4.8 ms pyramid to
level 0 at BOTH headline shapes, and round 3 measured the isolated 32->32
conv at 0.846 ms (NOTES_ROUND3) — so the 3-channel stride-2 STEM alone is
~2.4 ms at K=27 (one MXU pass per M-row, should be the cheapest conv in the
net). Hypothesis: XLA's emitter degenerates on C_in=3 strided NHWC input
(3 channels cannot fill 128-lane vectors; patch extraction goes scalar).

Variants (all numerically exact re-layouts of the same conv):
  A. direct stem (baseline), bf16 and f32
  B. W-fold: fold 8 input columns into channels (C=24), stem becomes a
     width-2 stride-1 conv with K=3*2*24=144, N=4*32=128 (output folded
     by 4), window = cells [j-1, j] — no column shift needed for s2.
     Kernel remap has structural zeros only.
  C. im2col-dot: 9 strided slices -> (M, 27) patches, jnp.dot to (M, 32).
  D. fold-4 stride-1 32->32 conv (kernel (3,3,128,128), K-tiles 9 vs
     direct 3 at M/4): the pass model predicts only 1.33x — measure to
     confirm the stem is the only worthwhile fold.

Run ALONE on the TPU host:
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_stem_fold_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np

CHAIN = 30
PEAK = 197.0


def fold_stem_kernel(k):
    """Remap a (3,3,3,32) stride-2 stem kernel to the W-folded layout:
    (kh=3, wcell=2, 8*3, 4*32). Output phase r (of 4, within a folded cell
    of 4 output columns = 8 input columns) at folded cell j reads original
    columns 8j+2r-1 .. 8j+2r+1 = folded cells j-1..j (width 2, left pad 1).
    Entry [h, t, i] of the original kernel lands at wcell=(2r+t)//8 via the
    LEFT cell being index 0: original col offset within [cell j-1, cell j]
    window is 8 + (2r + t - 1) in 0..15 -> wcell = off//8, sub = off%8."""
    kf = np.zeros((3, 2, 8 * 3, 4 * 32), k.dtype)
    for r in range(4):
        for t in range(3):
            off = 8 + 2 * r + t - 1  # position within the 16-col window
            wc, sub = off // 8, off % 8
            kf[:, wc, sub * 3 : sub * 3 + 3, r * 32 : (r + 1) * 32] = (
                k[:, t, :, :]
            )
    return kf


def fold_s1_kernel(k, f=4, cin=32, cout=32):
    """Remap a (3,3,cin,cout) stride-1 kernel to fold-f layout with kernel
    width 3 (unshifted; window = cells j-1..j+1). Output phase r at cell j
    reads original cols f*j+r-1..f*j+r+1; col f*j+c maps to (cell j+c//f,
    sub c%f) with the window origin at cell j-1."""
    kf = np.zeros((3, 3, f * cin, f * cout), k.dtype)
    for r in range(f):
        for t in range(3):
            off = f + r + t - 1  # position within the 3f-col window
            wc, sub = off // f, off % f
            kf[:, wc, sub * cin : (sub + 1) * cin,
               r * cout : (r + 1) * cout] = k[:, t, :, :]
    return kf


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

    def report(name, ms, flops=None):
        row = {"metric": name, "ms": round(ms * 1e3, 3)}
        if flops:
            row["tflops_per_s"] = round(flops / ms / 1e12, 2)
            row["pct_of_bf16_peak"] = round(100 * flops / ms / 1e12 / PEAK, 1)
        print(json.dumps(row), flush=True)

    B2, H, W = 16, 384, 640
    x_np = rng.rand(B2, H, W, 3).astype(np.float32)
    k_np = (rng.randn(3, 3, 3, 32) * 0.1).astype(np.float32)
    Ho, Wo = H // 2, W // 2
    stem_flops = 2 * 9 * Ho * Wo * 3 * 32 * B2

    x = jnp.asarray(x_np)
    rtt = timed(trivial, x)
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

    # ---- A: direct stem (torch geometry: explicit pad (1,1), NOT XLA SAME
    # which pads (0,1) at stride 2 — the model uses pad=(k-1)//2) ----------
    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        xx, kk = x.astype(dt), jnp.asarray(k_np, dt)
        t = chained(
            lambda a, w_: lax.conv_general_dilated(
                a, w_, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")),
            xx, kk)
        report(f"stem_direct_{name}", t, stem_flops)

    # ---- B: W-fold-8 stem (output fold 4) --------------------------------
    kf = jnp.asarray(fold_stem_kernel(k_np))

    def stem_folded(a, w_):
        b, h, ww, c = a.shape
        af = a.reshape(b, h, ww // 8, 8 * c)
        af = jnp.pad(af, ((0, 0), (0, 0), (1, 0), (0, 0)))
        y = lax.conv_general_dilated(
            af, w_.astype(a.dtype), (2, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(b, h // 2, ww // 2, 32)

    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        t = chained(stem_folded, x.astype(dt), kf.astype(dt))
        report(f"stem_wfold8_{name}", t, stem_flops)

    # parity check (f32, torch geometry)
    y_ref = lax.conv_general_dilated(
        x, jnp.asarray(k_np), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_fold = stem_folded(x, kf)
    err = float(jnp.max(jnp.abs(y_ref - y_fold)))
    print(json.dumps({"metric": "stem_wfold8_parity_maxerr", "value": err}),
          flush=True)

    # ---- C: im2col-dot stem ----------------------------------------------
    def stem_im2col(a, w_):
        b, h, ww, c = a.shape
        ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            ap[:, dh : dh + h : 2, dw : dw + ww : 2, :]
            for dh in range(3)
            for dw in range(3)
        ]
        patches = jnp.concatenate(cols, axis=-1)
        return patches @ w_.astype(a.dtype).reshape(27, 32)

    y_ic = stem_im2col(x, jnp.asarray(k_np))
    err = float(jnp.max(jnp.abs(y_ref - y_ic)))
    print(json.dumps({"metric": "stem_im2col_parity_maxerr", "value": err}),
          flush=True)
    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        t = chained(stem_im2col, x.astype(dt), jnp.asarray(k_np, dt))
        report(f"stem_im2col_{name}", t, stem_flops)

    # ---- D: fold-4 stride-1 32->32 ---------------------------------------
    x32_np = rng.rand(B2, Ho, Wo, 32).astype(np.float32)
    k32_np = (rng.randn(3, 3, 32, 32) * 0.1).astype(np.float32)
    x32 = jnp.asarray(x32_np)
    k32 = jnp.asarray(k32_np)
    conv_flops = 2 * 9 * Ho * Wo * 32 * 32 * B2

    t = chained(
        lambda a, w_: lax.conv_general_dilated(
            a, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16))
    report("conv32_direct_bf16", t, conv_flops)

    kf32 = jnp.asarray(fold_s1_kernel(k32_np))

    def conv32_folded(a, w_):
        b, h, ww, c = a.shape
        af = a.reshape(b, h, ww // 4, 4 * c)
        y = lax.conv_general_dilated(
            af, w_.astype(a.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(b, h, ww, 32)

    y_ref32 = lax.conv_general_dilated(
        x32, k32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.max(jnp.abs(y_ref32 - conv32_folded(x32, kf32))))
    print(json.dumps({"metric": "conv32_fold4_parity_maxerr", "value": err}),
          flush=True)
    t = chained(conv32_folded, x32.astype(jnp.bfloat16),
                kf32.astype(jnp.bfloat16))
    report("conv32_fold4_bf16", t, conv_flops)


if __name__ == "__main__":
    main()
