#!/usr/bin/env python
"""Isolated cost-volume fwd+bwd micro-bench: XLA vs Pallas v2 (VERDICT #10).

Times value_and_grad of a scalar-reduced cost volume at the shapes that
matter: the level-1 feature resolution of the training config (256x448
images -> 64x112 features, batch 2B=16 under the batched bidirectional
forward) and of the inference config (384x640 -> 96x160). Run ALONE on the
TPU host:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_cost_volume_grad.py

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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

    def timed(f, *a, reps=8):
        float(f(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    shapes = [
        ("train_l1_2B", (16, 64, 112, 32)),
        ("infer_l1_2B", (16, 96, 160, 32)),
        ("train_l1_B", (8, 64, 112, 32)),
    ]

    for name, shape in shapes:
        f1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
        f2 = jnp.asarray(rng.randn(*shape).astype(np.float32))
        rtt = timed(trivial, f1)

        @jax.jit
        def g_xla(a, b):
            val, grads = jax.value_and_grad(
                lambda x, y: jnp.sum(compute_cost_volume_reference(x, y, 4)),
                argnums=(0, 1),
            )(a, b)
            return val + jnp.sum(grads[0]) + jnp.sum(grads[1])

        @jax.jit
        def f_xla(a, b):
            return jnp.sum(compute_cost_volume_reference(a, b, 4))

        t_fx = timed(f_xla, f1, f2) - rtt
        t_gx = timed(g_xla, f1, f2) - rtt
        row = {
            "metric": f"cv_{name}",
            "shape": list(shape),
            "xla_fwd_ms": round(t_fx * 1e3, 3),
            "xla_fwd+grad_ms": round(t_gx * 1e3, 3),
        }

        if supported_v2(shape, 4):

            @jax.jit
            def g_pl(a, b):
                val, grads = jax.value_and_grad(
                    lambda x, y: jnp.sum(cost_volume_pallas_v2(x, y, 4)),
                    argnums=(0, 1),
                )(a, b)
                return val + jnp.sum(grads[0]) + jnp.sum(grads[1])

            @jax.jit
            def f_pl(a, b):
                return jnp.sum(cost_volume_pallas_v2(a, b, 4))

            row["pallas_fwd_ms"] = round((timed(f_pl, f1, f2) - rtt) * 1e3, 3)
            row["pallas_fwd+grad_ms"] = round(
                (timed(g_pl, f1, f2) - rtt) * 1e3, 3
            )
        print(json.dumps(row))


if __name__ == "__main__":
    main()
