#!/usr/bin/env python
"""Per-stage attribution of the flagship inference program (MFU analysis).

Times, under chained lax.scan on the real TPU, each stage of the
bf16 uflow forward at the bench shape (default b8, 384x640; pass
``--shape B,H,W`` for other shapes, e.g. ``--shape 4,448,1024`` for the
Sintel-recommended resolution):

  - feature pyramid (2B images)
  - standalone per-level decoder conv stacks (dense-net shapes, no glue)
  - cost volumes at each level's shape
  - per-level feature warp (resample) + final full-res upsamples
  - the full forward (the bench.py program)

The sum of stage times vs the full forward separates "conv time the MXU
ceiling explains" from glue; each conv stage also reports achieved
TFLOP/s so thin-channel (32-out) stages can be compared with the wide
decoder stages against the 197 TFLOP/s bf16 peak. Run ALONE on the host.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CHAIN = 30
PEAK = 197.0


def main():
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.models.uflow import PWCFlow, PWCFeaturePyramid
    from arflow_tpu.ops import compute_cost_volume, flow_to_warp, resample, upsample

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="8,384,640",
                    help="B,H,W (H and W must be multiples of 32)")
    shape = ap.parse_args().shape

    rng = np.random.RandomState(0)
    B, H, W = (int(v) for v in shape.split(","))
    dt = jnp.bfloat16
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

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

    rtt = timed(trivial, img1)

    def chained(fn, *args):
        """Time fn under a CHAIN-long scan with a data-dependent carry."""

        @jax.jit
        def run(*a):
            def body(c, _):
                out = fn(a[0] + c * jnp.asarray(1e-12, a[0].dtype), *a[1:])
                return c + jnp.sum(out).astype(jnp.float32) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        return (timed(run, *args) - rtt) / CHAIN

    def report(name, ms, flops=None):
        row = {"metric": name, "ms": round(ms * 1e3, 3)}
        if flops:
            row["tflops_per_s"] = round(flops / ms / 1e12, 2)
            row["pct_of_bf16_peak"] = round(100 * flops / ms / 1e12 / PEAK, 1)
        print(json.dumps(row))

    # -- full forward (the bench.py program) -------------------------------
    model = PWCFlow(level_dropout=0.0, feature_norm=True, dtype=dt)
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    params = variables["params"]

    t_full = chained(
        lambda a, p, b: model.apply(
            {"params": p}, a, b, with_bk=False
        )["flows_fw"][0],
        img1, params, img2,
    )
    report("full_fwd", t_full)

    # -- feature pyramid on both images (2B) -------------------------------
    pyr = PWCFeaturePyramid(dtype=dt)
    pvars = jax.jit(lambda r: pyr.init(r, jnp.concatenate([img1, img2])))(
        jax.random.PRNGKey(0)
    )
    pyr_flops = 0
    h, w, cin = H, W, 3
    for _ in range(5):
        h, w = h // 2, w // 2
        pyr_flops += 2 * 9 * h * w * (cin * 32 + 32 * 32 + 32 * 32)
        cin = 32
    pyr_flops *= 2 * B  # two images, batch
    t_pyr = chained(
        lambda a, p: pyr.apply({"params": p}, a)[-1],
        jnp.concatenate([img1, img2]), pvars["params"],
    )
    report("feature_pyramid_2B", t_pyr, pyr_flops)

    # -- per-level decoder conv stacks (standalone dense-net shapes) -------
    import flax.linen as nn
    from arflow_tpu.models.layers import conv2d, leaky_relu

    class DecoderConvs(nn.Module):
        @nn.compact
        def __call__(self, x_in):
            x_out = None
            for c in (128, 128, 96, 64, 32):
                x_out = leaky_relu(conv2d(c, 3, dtype=dt)(x_in), 0.1)
                x_in = jnp.concatenate([x_in, x_out], axis=-1)
            return conv2d(2, 3, dtype=dt)(x_out)

    t_dec_sum = 0.0
    for level in (4, 3, 2, 1):
        hh, ww = H >> (level + 1), W >> (level + 1)
        cin = 32 + 2 + 81 + 32  # context_up + flow + cost volume + features
        x = jnp.asarray(rng.rand(B, hh, ww, cin).astype(np.float32), dt)
        dec = DecoderConvs()
        dvars = jax.jit(dec.init)(jax.random.PRNGKey(0), x)
        flops = 0
        ci = cin
        for c in (128, 128, 96, 64, 32):
            flops += 2 * 9 * hh * ww * ci * c
            ci += c
        flops += 2 * 9 * hh * ww * 32 * 2
        flops *= B
        t = chained(lambda a, p, d=dec: d.apply(p, a), x, dvars)
        t_dec_sum += t
        report(f"decoder_convs_l{level}_{hh}x{ww}", t, flops)

    # -- cost volumes at each level's shape --------------------------------
    t_cv_sum = 0.0
    for level in (4, 3, 2, 1):
        hh, ww = H >> (level + 1), W >> (level + 1)
        f = jnp.asarray(rng.rand(B, hh, ww, 32).astype(np.float32), dt)
        flops = 2 * 81 * hh * ww * 32 * B
        t = chained(
            lambda a, b: compute_cost_volume(a, b, 4), f, f + 0.1
        )
        t_cv_sum += t
        report(f"cost_volume_l{level}_{hh}x{ww}", t, flops)

    # -- per-level feature warp + the two final upsamples ------------------
    t_warp_sum = 0.0
    for level in (4, 3, 2, 1):
        hh, ww = H >> (level + 1), W >> (level + 1)
        f = jnp.asarray(rng.rand(B, hh, ww, 32).astype(np.float32), dt)
        fl = jnp.asarray(rng.rand(B, hh, ww, 2).astype(np.float32) * 4, dt)
        t = chained(lambda ff, fl_: resample(ff, flow_to_warp(fl_)), f, fl)
        t_warp_sum += t
        report(f"feature_warp_l{level}_{hh}x{ww}", t)

    fl2 = jnp.asarray(rng.rand(B, H // 4, W // 4, 2).astype(np.float32), dt)
    t_up = chained(
        lambda fl_: upsample(upsample(fl_, is_flow=True), is_flow=True), fl2
    )
    report("final_upsample_x2", t_up)

    # -- refinement stack (6 dilated convs + out at the 1/4-res level) -----
    class Refine(nn.Module):
        @nn.compact
        def __call__(self, x):
            for j, (c, d) in enumerate(
                ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))
            ):
                x = leaky_relu(conv2d(c, 3, dilation=d, dtype=dt)(x), 0.1)
            return conv2d(2, 3, dtype=dt)(x)

    hh, ww = H // 4, W // 4
    xr = jnp.asarray(rng.rand(B, hh, ww, 34).astype(np.float32), dt)
    ref = Refine()
    rvars = jax.jit(ref.init)(jax.random.PRNGKey(0), xr)
    rflops = 0
    ci = 34
    for c in (128, 128, 128, 96, 64, 32):
        rflops += 2 * 9 * hh * ww * ci * c
        ci = c
    rflops = (rflops + 2 * 9 * hh * ww * 32 * 2) * B
    t_ref = chained(lambda a, p: ref.apply(p, a), xr, rvars)
    report(f"refinement_stack_{hh}x{ww}", t_ref, rflops)

    # -- context deconv per level + normalize pairs + inter-level upsample --
    from arflow_tpu.models.layers import ConvTranspose2dTorch
    from arflow_tpu.ops import normalize_features

    t_misc = 0.0
    for level in (4, 3, 2, 1):
        hh, ww = H >> (level + 1), W >> (level + 1)
        xc = jnp.asarray(rng.rand(B, hh, ww, 32).astype(np.float32), dt)
        dec = ConvTranspose2dTorch(32, kernel_size=4, stride=2, padding=1,
                                   dtype=dt)
        dvars = jax.jit(dec.init)(jax.random.PRNGKey(0), xc)
        t = chained(lambda a, p, d=dec: d.apply(p, a), xc, dvars)
        t_misc += t
        report(f"context_deconv_l{level}", t)
        f = jnp.asarray(rng.rand(B, hh, ww, 32).astype(np.float32), dt)
        t = chained(
            lambda a, b: normalize_features(
                [a, b], True, True, True, True
            )[0],
            f, f + 0.1,
        )
        t_misc += t
        report(f"normalize_pair_l{level}", t)
        fl = jnp.asarray(rng.rand(B, hh, ww, 2).astype(np.float32), dt)
        t = chained(lambda a: upsample(a, is_flow=True), fl)
        t_misc += t
        report(f"flow_upsample_l{level}", t)

    glue = t_full - (t_pyr + t_dec_sum + t_cv_sum + t_warp_sum + t_up
                     + t_ref + t_misc)
    print(json.dumps({
        "metric": "attribution_summary",
        "full_ms": round(t_full * 1e3, 2),
        "pyramid_ms": round(t_pyr * 1e3, 2),
        "decoder_ms": round(t_dec_sum * 1e3, 2),
        "cost_volume_ms": round(t_cv_sum * 1e3, 2),
        "warp_ms": round(t_warp_sum * 1e3, 2),
        "upsample_ms": round(t_up * 1e3, 2),
        "refinement_ms": round(t_ref * 1e3, 2),
        "misc_ms": round(t_misc * 1e3, 2),
        "unattributed_glue_ms": round(glue * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
