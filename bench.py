#!/usr/bin/env python
"""Benchmark: UFlow PWCFlow inference throughput on one TPU chip.

Measures flow maps/sec for 2-frame forward inference at 384x640 (the
reference README's recommended KITTI/Cityscapes resolution,
/root/reference/README.md:50), batched to keep the chip busy.

Baseline (vs_baseline denominator): the reference PyTorch PWCFlow
(models/uflow_model.py, correlation_native path — the only runnable path
without a CUDA-9 toolchain) measured on this machine's CPU:
1.195 flow maps/sec @ 384x640 batch 1 (see BASELINE.md). The BASELINE.json
north star is >=5x this.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_CPU_MAPS_PER_SEC = 1.195  # measured 2026-08-16, torch 2.13 CPU


def main():
    import os

    # The fused Pallas cost volume is the TPU default for all supported
    # shapes (wins 2.6x end-to-end at this resolution and 1.4-1.8x at
    # training shapes incl. gradients; see BASELINE.md). Pinned here so the
    # bench stays deterministic even if the caller exported =0.
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from arflow_tpu.models.uflow import PWCFlow

    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    h, w = 384, 640
    batch = 8
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))

    init_fn = jax.jit(lambda r: model.init(r, img1, img2, with_bk=False))
    variables = init_fn(jax.random.PRNGKey(0))

    # Timing methodology: on the axon-tunneled TPU, block_until_ready does not
    # wait for remote execution; a scalar fetch does. Device compute time is
    # estimated as (forward+fetch) - (trivial fetch RTT), medians over 10 reps.
    @jax.jit
    def trivial(a):
        return jnp.sum(a)

    @jax.jit
    def forward_reduced(params, a, b):
        out = model.apply({"params": params}, a, b, with_bk=False)["flows_fw"][0]
        return jnp.sum(out)

    float(trivial(img1))  # compile
    float(forward_reduced(variables["params"], img1, img2))  # compile

    def timed(f, *a, reps=10):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    rtt = timed(trivial, img1)
    fwd = timed(forward_reduced, variables["params"], img1, img2)
    dt = max(fwd - rtt, 1e-6)
    maps_per_sec = batch / dt

    # FLOPs from the compiled program (XLA cost analysis); MFU against the
    # chip's bf16 MXU peak (TPU v5e: 197 TFLOP/s — f32 convs run on the same
    # MXU via multi-pass, so bf16 peak is the honest denominator).
    PEAK_TFLOPS = 197.0
    flops = None
    try:
        an = (
            forward_reduced.lower(variables["params"], img1, img2)
            .compile()
            .cost_analysis()
        )
        if isinstance(an, (list, tuple)):
            an = an[0]
        flops = float(an.get("flops", 0.0)) or None
    except Exception:
        pass
    extra = {}
    if flops:
        tflops_s = flops / dt / 1e12
        extra = {
            "program_gflops_per_batch": round(flops / 1e9, 1),
            "tflops_per_s": round(tflops_s, 2),
            "mfu_pct_of_bf16_peak": round(100.0 * tflops_s / PEAK_TFLOPS, 2),
        }

    # bf16 compute (the recommended inference mode — EPE-safe per
    # BASELINE.md round-2 validation: inference dtype delta 0.02-0.03 px
    # mean, well inside the BASELINE.json <=0.05 EPE acceptance band, and
    # bf16 TRAINS to equal-or-better EPE; params/outputs stay f32).
    headline = maps_per_sec
    extra["f32_maps_per_sec"] = round(maps_per_sec, 3)
    try:
        model_bf16 = PWCFlow(
            level_dropout=0.0, feature_norm=True, dtype=jnp.bfloat16
        )

        @jax.jit
        def forward_bf16(params, a, b):
            out = model_bf16.apply({"params": params}, a, b, with_bk=False)
            return jnp.sum(out["flows_fw"][0])

        float(forward_bf16(variables["params"], img1, img2))
        fwd16 = timed(forward_bf16, variables["params"], img1, img2)
        bf16_maps = batch / max(fwd16 - rtt, 1e-6)
        extra["bf16_maps_per_sec"] = round(bf16_maps, 3)
        headline = max(headline, bf16_maps)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "uflow_inference_384x640_maps_per_sec",
                "value": round(headline, 3),
                "unit": "flow_maps/s",
                "vs_baseline": round(headline / REFERENCE_CPU_MAPS_PER_SEC, 2),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
