#!/usr/bin/env python
"""bf16-compute vs f32 end-to-end training comparison (VERDICT r1 item 3).

Trains the same supervised flow task (known (3,1) px shift on smoothed-noise
pairs, as tools/sanity_train.py) twice — f32 compute and bf16 compute (params
and outputs stay f32; matmuls/convs run bf16 on the MXU) — and reports:

- the EPE trajectory of both runs (same data, same init seed),
- final-EPE delta (accept threshold: <=0.05 px, BASELINE.json north star),
- cross-evaluation flow deltas: each trained params set evaluated under both
  compute dtypes on held-out pairs, max/mean |flow_bf16 - flow_f32| in px
  (the pure inference-precision error, independent of training noise).

Run on the TPU host: python -m arflow_tpu.tools.bf16_compare
Prints one JSON line with the verdict.
"""

from __future__ import annotations

import json

import numpy as np


def make_pairs(rng, n, h=128, w=160, dx=3.0, dy=1.0):
    from scipy.ndimage import convolve

    k = np.ones((5, 5)) / 25.0
    p1, p2 = [], []
    for _ in range(n):
        base = rng.rand(h + 2, w + 4, 3).astype(np.float32)
        base = np.stack([convolve(base[..., c], k) for c in range(3)], -1)
        p1.append(base[:h, :w])
        p2.append(base[1 : h + 1, 3 : w + 3])
    return np.stack(p1), np.stack(p2), (dx, dy)


def train_one(dtype_name, img1, img2, gt, dxy, steps, record_every=25):
    import jax
    import jax.numpy as jnp
    import optax

    from arflow_tpu.config import Config
    from arflow_tpu.losses import MseLoss
    from arflow_tpu.models.uflow_prob import PWCProbFlow

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = PWCProbFlow(out_channels=(2, 2, 0), feature_norm=True, dtype=dtype)
    loss_fn = MseLoss(
        Config(
            {
                "type": "mse", "w_mse": 1.0, "w_entropy": 0.01, "diag": True,
                "inv_cov": False, "approx_entropy": False, "n_samples": 1,
                "offdiag_reg": 0.0, "align_corners": False,
            }
        )
    )
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    params = variables["params"]
    tx = optax.adam(5e-4)
    opt = tx.init(params)
    dx, dy = dxy

    @jax.jit
    def step(params, opt, key):
        def loss(p):
            res = model.apply({"params": p}, img1, img2, with_bk=False)
            out = loss_fn(res, gt, rng=key)
            return out["total"], res["flows_fw"][0][..., :2]

        (l, f0), g = jax.value_and_grad(loss, has_aux=True)(params)
        u, opt2 = tx.update(g, opt, params)
        epe = jnp.mean(
            jnp.sqrt((f0[..., 0] - dx) ** 2 + (f0[..., 1] - dy) ** 2)
        )
        return optax.apply_updates(params, u), opt2, l, epe

    key = jax.random.PRNGKey(0)
    curve = []
    for i in range(steps):
        params, opt, l, epe = step(params, opt, jax.random.fold_in(key, i))
        if i % record_every == 0 or i == steps - 1:
            curve.append((i, float(epe)))
    return params, curve


def main(steps: int = 300):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arflow_tpu.models.uflow_prob import PWCProbFlow

    rng = np.random.RandomState(0)
    i1, i2, dxy = make_pairs(rng, 8)
    img1, img2 = jnp.asarray(i1), jnp.asarray(i2)
    gt = jnp.tile(jnp.asarray(dxy, jnp.float32), (8, 128, 160, 1))

    params_f32, curve_f32 = train_one("f32", img1, img2, gt, dxy, steps)
    params_bf16, curve_bf16 = train_one("bf16", img1, img2, gt, dxy, steps)

    # Held-out pairs; evaluate each params set under both compute dtypes.
    h1, h2, _ = make_pairs(np.random.RandomState(1), 4)
    h1, h2 = jnp.asarray(h1), jnp.asarray(h2)
    deltas = {}
    for pname, params in (("f32_params", params_f32), ("bf16_params", params_bf16)):
        flows = {}
        for dname, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            m = PWCProbFlow(out_channels=(2, 2, 0), feature_norm=True, dtype=dt)
            f = jax.jit(
                lambda p, a, b, m=m: m.apply(
                    {"params": p}, a, b, with_bk=False
                )["flows_fw"][0][..., :2]
            )(params, h1, h2)
            flows[dname] = np.asarray(f)
        d = np.abs(flows["bf16"] - flows["f32"])
        deltas[pname] = {
            "max_px": float(d.max()), "mean_px": float(d.mean()),
        }

    final_f32 = curve_f32[-1][1]
    final_bf16 = curve_bf16[-1][1]
    print(
        json.dumps(
            {
                "metric": "bf16_vs_f32_training",
                "steps": steps,
                "final_epe_f32": round(final_f32, 4),
                "final_epe_bf16": round(final_bf16, 4),
                "final_epe_delta": round(abs(final_bf16 - final_f32), 4),
                "epe_curve_f32": curve_f32,
                "epe_curve_bf16": curve_bf16,
                "inference_flow_delta_px": deltas,
                "accept_threshold": 0.05,
                # One-sided: bf16 ending BETTER than f32 is safe by
                # definition; only a worse final EPE (beyond the BASELINE
                # north-star tolerance) rejects bf16.
                "bf16_epe_safe": final_bf16 <= final_f32 + 0.05,
            }
        )
    )


if __name__ == "__main__":
    main()
