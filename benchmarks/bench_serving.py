#!/usr/bin/env python
"""Streaming-video serving rate: per-frame pyramid reuse vs monolithic pairs.

Measures the device rate of video-style inference at 384x640 batch 1 (the
serving engine's workload, arflow_tpu/serving/engine.py), f32 and bf16:

- monolithic: the reference-style loop — every pair re-runs the FULL model,
  so each frame's feature pyramid is computed twice across the stream.
- streaming: one pyramid per frame, decoder consumes (prev, cur) pyramids —
  what StreamingFlowEngine does per push.

Both are timed with the house chained-scan methodology (sequential scan with
a data-dependent carry, minus trivial-fetch RTT): the scan carry for the
streaming case IS the cached pyramid, so the measured number is the engine's
steady-state device rate without host dispatch noise (the tunnel on this
host adds ~25-30 ms RTT per python-level dispatch that a real TPU VM does
not see).

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_serving.py
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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.models.uflow import PWCFlow

    h, w = 384, 640
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

    rtt = timed(trivial, jnp.zeros((1,), jnp.float32))
    print(json.dumps({"metric": "rtt", "ms": round(rtt * 1e3, 2)}), flush=True)

    frames = jnp.asarray(rng.rand(CHAIN, 1, h, w, 3).astype(np.float32))
    img0 = frames[0]

    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        model = PWCFlow(level_dropout=0.0, feature_norm=True, dtype=dt)
        variables = jax.jit(
            lambda r, a, b: model.init(r, a, b, with_bk=False)
        )(jax.random.PRNGKey(0), img0, img0)
        params = variables["params"]

        def pyramid(p, img):
            return model.apply(
                {"params": p}, img, method=lambda m, x: m.feature_pyramid(x)
            )

        def decode(p, fp1, fp2):
            return model.apply(
                {"params": p}, fp1, fp2,
                method=lambda m, a, b: m.forward_2_frames(a, b),
            )[0]

        @jax.jit
        def chain_monolithic(p, fr):
            def body(c, frame):
                out = model.apply(
                    {"params": p}, fr[0] + c * 1e-12, frame, with_bk=False
                )["flows_fw"][0]
                return c + jnp.sum(out) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), fr, length=CHAIN)
            return c

        @jax.jit
        def chain_streaming(p, fr):
            fp0 = pyramid(p, fr[0])

            def body(carry, frame):
                fp_prev, c = carry
                fp = pyramid(p, frame + c * 1e-12)
                flow = decode(p, fp_prev, fp)
                return (fp, c + jnp.sum(flow) * 1e-20), None

            (_, c), _ = lax.scan(body, (fp0, jnp.float32(0.0)), fr,
                                 length=CHAIN)
            return c

        t_mono = (timed(chain_monolithic, params, frames) - rtt) / CHAIN
        t_stream = (timed(chain_streaming, params, frames) - rtt) / CHAIN
        print(json.dumps({
            "metric": f"serving_384x640_b1_{dt_name}",
            "monolithic_ms_per_flow": round(t_mono * 1e3, 3),
            "streaming_ms_per_flow": round(t_stream * 1e3, 3),
            "speedup": round(t_mono / max(t_stream, 1e-9), 3),
            "streaming_flows_per_s": round(1.0 / max(t_stream, 1e-9), 1),
        }), flush=True)

    three_frame(rng, rtt, timed)


def three_frame(rng, rtt, timed):
    """3-frame PWCLite (README multi-view): the monolithic sliding window
    recomputes every frame's pyramid 3x; the streaming engine computes each
    exactly once (engine.py 3-frame window). Scan carry = the two cached
    pyramids."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from arflow_tpu.models.pwclite import PWCLite

    h, w = 384, 640
    frames = jnp.asarray(rng.rand(CHAIN, 1, h, w, 3).astype(np.float32))
    img0 = frames[0]

    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        model = PWCLite(n_frames=3, dtype=dt)
        params = jax.jit(
            lambda r, a: model.init(r, a, a, a, with_bk=False)
        )(jax.random.PRNGKey(0), img0)["params"]

        def pyramid(p, img):
            return model.apply(
                {"params": p}, img,
                method=lambda m, x: m.feature_extractor(x),
            )

        def decode3(p, fp0, fp1, fp2):
            return model.apply(
                {"params": p}, fp0, fp1, fp2,
                method=lambda m, a, b, c: m.forward_3_frames(a, b, c),
            )

        @jax.jit
        def chain_monolithic(p, fr):
            def body(c, frame):
                res = model.apply(
                    {"params": p}, fr[0] + c * 1e-12, fr[1], frame,
                    with_bk=True,
                )
                out = res["flows_fw"][0] + res["flows_bw"][0]
                return c + jnp.sum(out) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), fr, length=CHAIN)
            return c

        @jax.jit
        def chain_streaming(p, fr):
            fp0 = pyramid(p, fr[0])
            fp1 = pyramid(p, fr[1])

            def body(carry, frame):
                fp_a, fp_b, c = carry
                fp = pyramid(p, frame + c * 1e-12)
                flows_10, flows_12 = decode3(p, fp_a, fp_b, fp)
                c = c + jnp.sum(flows_12[0] + flows_10[0]) * 1e-20
                return (fp_b, fp, c), None

            (_, _, c), _ = lax.scan(
                body, (fp0, fp1, jnp.float32(0.0)), fr, length=CHAIN
            )
            return c

        t_mono = (timed(chain_monolithic, params, frames) - rtt) / CHAIN
        t_stream = (timed(chain_streaming, params, frames) - rtt) / CHAIN
        print(json.dumps({
            "metric": f"serving_3frame_384x640_b1_{dt_name}",
            "monolithic_ms_per_window": round(t_mono * 1e3, 3),
            "streaming_ms_per_window": round(t_stream * 1e3, 3),
            "speedup": round(t_mono / max(t_stream, 1e-9), 3),
            "streaming_windows_per_s": round(1.0 / max(t_stream, 1e-9), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
