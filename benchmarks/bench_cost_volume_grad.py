#!/usr/bin/env python
"""Isolated cost-volume fwd and fwd+grad micro-bench: XLA vs Pallas v2.

VERDICT #10 data: does the Pallas kernel (incl. its shifted-product custom
VJP) beat XLA at the shapes the TRAINING step uses? Each measurement
iterates the op ITERS times inside one jitted lax.scan with a
data-dependent carry (amortizes the ~30 ms tunnel RTT to noise). Run ALONE
on the TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_cost_volume_grad.py

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import time

import numpy as np

ITERS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.ops.cost_volume import compute_cost_volume_reference
    from arflow_tpu.ops.pallas.cost_volume_pallas import (
        cost_volume_pallas_v2,
        supported_v2,
    )

    rng = np.random.RandomState(0)

    @jax.jit
    def trivial(a):
        return jnp.sum(a)

    def timed(f, *a, reps=7):
        float(f(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    def scan_time(fn, f1, f2, rtt, grad: bool):
        @jax.jit
        def run(f1, f2):
            def body(c, _):
                a = f1 + c * 1e-12
                if grad:
                    val, g = jax.value_and_grad(
                        lambda x, y: jnp.sum(fn(x, y)), argnums=(0, 1)
                    )(a, f2)
                    out = val + jnp.sum(g[0]) + jnp.sum(g[1])
                else:
                    out = jnp.sum(fn(a, f2))
                return c + out * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        return (timed(run, f1, f2) - rtt) / ITERS

    # (name, shape): per-direction training levels, 2B variant, inference l1
    shapes = [
        ("train_l1_B", (8, 64, 112, 32)),
        ("train_l2_B", (8, 32, 56, 32)),
        ("train_l1_2B", (16, 64, 112, 32)),
        ("infer_l1_B", (8, 96, 160, 32)),
    ]

    for name, shape in shapes:
        f1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
        f2 = jnp.asarray(rng.randn(*shape).astype(np.float32))
        rtt = timed(trivial, f1)
        row = {"metric": f"cv_{name}", "shape": list(shape)}
        xla = lambda a, b: compute_cost_volume_reference(a, b, 4)
        row["xla_fwd_ms"] = round(
            scan_time(xla, f1, f2, rtt, grad=False) * 1e3, 3
        )
        row["xla_fwd+grad_ms"] = round(
            scan_time(xla, f1, f2, rtt, grad=True) * 1e3, 3
        )
        if supported_v2(shape, 4):
            pl = lambda a, b: cost_volume_pallas_v2(a, b, 4)
            row["pallas_fwd_ms"] = round(
                scan_time(pl, f1, f2, rtt, grad=False) * 1e3, 3
            )
            row["pallas_fwd+grad_ms"] = round(
                scan_time(pl, f1, f2, rtt, grad=True) * 1e3, 3
            )
        print(json.dumps(row))


if __name__ == "__main__":
    main()
