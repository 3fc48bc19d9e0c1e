#!/usr/bin/env python
"""A/B: W-folded feature pyramid vs the direct conv pyramid.

bench_stem_fold_probe.py measured the fold-4 relayout of the pyramid's
thin convs at 1.4-1.67x per conv: folding 4 W-columns into channels turns
the N=32-lane-starved conv into a (3,3,128,128) conv that XLA runs at 63%
of peak MACHINE rate (vs 38-44% for the decoder stacks), more than paying
for its 4x structural-zero kernel. This probe assembles the COMPLETE
5-level pyramid in folded layout (activations stay fold-4 across levels;
the stride-2 stem consumes fold-8 = a reshape of fold-4) with the real
PWCFeaturePyramid weights remapped, checks exact parity per level, and
times both at the three headline shapes.

Layout algebra (all exact, structural zeros only):
  stride-1 3x3, fold f=4: output phase r at cell j reads original columns
    4j+r-1..4j+r+1 -> cells j-1..j+1 -> kernel (3, 3, 4C, 4N).
  stride-2 3x3 stem, output fold 4 = input fold 8: output phase r at cell
    j reads original columns 8j+2r-1..8j+2r+1 -> cells j-1..j (width 2,
    one cell of left pad) -> kernel (3, 2, 8C, 4N).

Run ALONE on the TPU host:
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_pyramid_fold_ab.py
"""

from __future__ import annotations

import json
import time

import numpy as np

CHAIN = 30
PEAK = 197.0


def fold_s1_kernel(k, f=4):
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3)
    kf = np.zeros((3, 3, f * cin, f * cout), np.float32)
    for r in range(f):
        for t in range(3):
            off = f + r + t - 1
            wc, sub = off // f, off % f
            kf[:, wc, sub * cin : (sub + 1) * cin,
               r * cout : (r + 1) * cout] = k[:, t]
    return kf


def fold_s2_kernel(k, f=4):
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3)
    fi = 2 * f
    kf = np.zeros((3, 2, fi * cin, f * cout), np.float32)
    for r in range(f):
        for t in range(3):
            off = fi + 2 * r + t - 1
            wc, sub = off // fi, off % fi
            kf[:, wc, sub * cin : (sub + 1) * cin,
               r * cout : (r + 1) * cout] = k[:, t]
    return kf


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.models.uflow import PWCFeaturePyramid

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

    def folded_pyramid_fn(params, alpha=0.1, dt=jnp.bfloat16):
        """Build a jittable folded pyramid from PWCFeaturePyramid params."""
        folded = []  # per level: (kf_stem, b_stem, [(kf, b), (kf, b)])
        for level in range(5):
            ks = np.asarray(params[f"conv_l{level}_0"]["kernel"])
            bs = np.asarray(params[f"conv_l{level}_0"]["bias"])
            entry = [jnp.asarray(fold_s2_kernel(ks), dt),
                     jnp.asarray(np.tile(bs, 4), dt)]
            s1 = []
            for i in (1, 2):
                kk = np.asarray(params[f"conv_l{level}_{i}"]["kernel"])
                bb = np.asarray(params[f"conv_l{level}_{i}"]["bias"])
                s1.append((jnp.asarray(fold_s1_kernel(kk), dt),
                           jnp.asarray(np.tile(bb, 4), dt)))
            folded.append((entry[0], entry[1], s1))

        def apply(x):
            x = x.astype(dt) * 2.0 - 1.0
            b, h, w, c = x.shape
            x = x.reshape(b, h, w // 4, 4 * c)  # fold-4
            feats = []
            for kf_stem, b_stem, s1 in folded:
                bb, hh, wc, cc = x.shape
                x8 = x.reshape(bb, hh, wc // 2, 2 * cc)
                x8 = jnp.pad(x8, ((0, 0), (0, 0), (1, 0), (0, 0)))
                y = lax.conv_general_dilated(
                    x8, kf_stem, (2, 1), ((1, 1), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = y + b_stem
                y = jnp.where(y > 0, y, alpha * y)
                for kf, bf in s1:
                    y = lax.conv_general_dilated(
                        y, kf, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    y = y + bf
                    y = jnp.where(y > 0, y, alpha * y)
                x = y
                feats.append(y)
            # unfold for parity/consumers
            return [
                f.reshape(f.shape[0], f.shape[1], f.shape[2] * 4, 32)
                for f in feats
            ]

        return apply

    for B2, H, W in ((16, 384, 640), (8, 448, 1024), (2, 448, 1024)):
        x = jnp.asarray(rng.rand(B2, H, W, 3).astype(np.float32))
        rtt = timed(trivial, x)

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

        pyr_flops = 0
        h, w, cin = H, W, 3
        for _ in range(5):
            h, w = h // 2, w // 2
            pyr_flops += 2 * 9 * h * w * (cin * 32 + 32 * 32 + 32 * 32)
            cin = 32
        pyr_flops *= B2

        pyr = PWCFeaturePyramid(dtype=jnp.bfloat16)
        pvars = jax.jit(lambda r: pyr.init(r, x))(jax.random.PRNGKey(0))
        params = jax.device_get(pvars["params"])

        t = chained(lambda a, p: pyr.apply({"params": p}, a)[-1],
                    x, pvars["params"])
        report(f"pyramid_direct_2B{B2}_{H}x{W}", t, pyr_flops)

        fold_apply = folded_pyramid_fn(params)
        t = chained(lambda a: fold_apply(a)[-1], x)
        report(f"pyramid_folded_2B{B2}_{H}x{W}", t, pyr_flops)

        # parity (bf16 both sides; fold introduces no arithmetic change
        # beyond summation-order inside the MXU pass)
        ref = jax.jit(lambda a: pyr.apply({"params": pvars["params"]}, a))(x)
        got = jax.jit(fold_apply)(x)
        errs = [
            float(jnp.max(jnp.abs(r.astype(jnp.float32)
                                  - g.astype(jnp.float32))))
            for r, g in zip(ref, got)
        ]
        print(json.dumps({
            "metric": f"fold_parity_maxerr_2B{B2}",
            "per_level": [round(e, 8) for e in errs],
        }), flush=True)


if __name__ == "__main__":
    main()
