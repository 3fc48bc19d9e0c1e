#!/usr/bin/env python
"""Probe: Mosaic (Pallas TPU) dynamic-gather support, measured on v5e.

Closes the round-3 "Pallas fused warp" candidate with hardware evidence
instead of an assumption. The loss/model warp (`ops/warp.py`) sits at XLA's
~7 ns/descriptor gather wall (BASELINE.md); a Pallas in-VMEM gather kernel
was the one untested alternative. Findings (jax 0.9.0, TPU v5e, 2026-08):

1. ``jnp.take(src, idx_1d, axis=0)`` and advanced indexing ``src[idx]``
   inside a Pallas kernel are REJECTED at trace time ("Shape mismatch in
   input, indices and output") — Mosaic's dynamic_gather requires
   src/idx/out to be same-shape.
2. Same-shape ``jnp.take_along_axis(src, idx, axis=0)`` (SUBLANE gather)
   CRASHES the Mosaic compiler (tpu_compile_helper exit 1). No cross-row
   dynamic indexing lowers.
3. Same-shape ``jnp.take_along_axis(src, idx, axis=1)`` (LANE gather)
   compiles, is bit-correct, and runs 1.65x faster than XLA's equivalent
   at (1024, 128) f32: 12.0 ns/element vs XLA 19.8 ns/element (chained
   scan, medians of 5).

Why this does NOT help the warp: bilinear flow-warp is an arbitrary 2-D
gather. Lane-gather can only index within one sublane row, so a warp would
need a sublane (cross-row) gather — which does not lower (finding 2) — or
a quadratic one-hot matmul (already used where it wins: the range-map
splat, arflow_tpu/ops/occlusion.py). Per-element rates seal it anyway: the
packed 4C-lane XLA warp gather moves 12 f32 per 7 ns descriptor
~= 0.6 ns/element, 20x faster than Mosaic's elementwise lane gather. The
warp stays on XLA's packed gather (reference cost center:
utils/warp_utils.py flow_warp; our arflow_tpu/ops/warp.py:bilinear_gather).

Run ALONE on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_pallas_gather_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np

S, LANES = 1024, 128
CHAIN = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("backend:", jax.default_backend())

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(S, LANES).astype(np.float32))

    # --- 1+2: which gather forms lower at all ------------------------------
    def k_take(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take(src_ref[...], idx_ref[...], axis=0)

    def k_sublane(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=0)

    def k_lane(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=1)

    idx1d = jnp.asarray(rng.randint(0, S, size=(S,)).astype(np.int32))
    idx_sub = jnp.asarray(rng.randint(0, S, size=(S, LANES)).astype(np.int32))
    idx_lane = jnp.asarray(
        rng.randint(0, LANES, size=(S, LANES)).astype(np.int32)
    )

    out_shape = jax.ShapeDtypeStruct((S, LANES), jnp.float32)
    for name, kern, idx, axis in [
        ("take_1d_idx", k_take, idx1d, 0),
        ("sublane_take_along", k_sublane, idx_sub, 0),
        ("lane_take_along", k_lane, idx_lane, 1),
    ]:
        try:
            fn = jax.jit(pl.pallas_call(kern, out_shape=out_shape))
            out = np.asarray(fn(src, idx))
            if idx.ndim == 1:  # jnp.take semantics, not take_along_axis
                ref = np.take(np.asarray(src), np.asarray(idx), axis=axis)
            else:
                ref = np.take_along_axis(
                    np.asarray(src), np.asarray(idx), axis=axis
                )
            print(name, "-> OK parity=", bool(np.allclose(out, ref)))
        except Exception as e:  # noqa: BLE001 - probe records the failure
            print(name, "-> FAIL:", str(e).split("\n")[0][:200])

    # --- 3: lane-gather throughput vs XLA ----------------------------------
    lane_call = pl.pallas_call(k_lane, out_shape=out_shape)

    def chained(fn):
        def run(src, idx):
            def body(c, _):
                o = fn(src, (idx + c.astype(jnp.int32)) % LANES)
                # Full-sum carry: every output element is consumed, so XLA
                # cannot legally narrow the gather (bench_matmul_probe.py
                # convention; a single-element carry would let the XLA arm
                # fold to one gathered element while Pallas does full work).
                return c + jnp.sum(o) * 1e-20, None

            r, _ = lax.scan(body, jnp.float32(0), None, length=CHAIN)
            return r

        return jax.jit(run)

    # RTT floor: a trivial jitted scalar fetch, subtracted from every timed
    # run (bench_matmul_probe.py convention) so tunnel dispatch/fetch latency
    # does not inflate the per-call figures.
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(json.dumps({"rtt_ms": rtt * 1e3}))

    for label, fn in [
        ("pallas_lane_gather", lane_call),
        ("xla_take_along_lane", lambda s, i: jnp.take_along_axis(s, i, axis=1)),
    ]:
        f = chained(fn)
        float(f(src, idx_lane))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(src, idx_lane))
            ts.append(time.perf_counter() - t0)
        per = max(float(np.median(ts)) - rtt, 0.0) / CHAIN
        print(
            json.dumps(
                {
                    "variant": label,
                    "us_per_call": per * 1e6,
                    "ns_per_element": per / (S * LANES) * 1e9,
                }
            )
        )


if __name__ == "__main__":
    main()
