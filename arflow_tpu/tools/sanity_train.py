#!/usr/bin/env python
"""TPU learning sanity: supervised MSE training drives EPE to ~0.5 px.

Run on a TPU host: python -m arflow_tpu.tools.sanity_train

Trains PWCProbFlow with the supervised Gaussian-posterior MSE loss on
synthetic smoothed-noise pairs with a known (3, 1) px shift; 300 Adam steps
take EPE from ~15 to <0.6 (measured 2026-08-16, TPU v5e — see BASELINE.md).

Note: the *unsupervised* census objective on a tiny static synthetic set
collapses to its known degenerate optimum (all flow pushed out of frame
zeroes the masked census term — a property of the objective shared with the
reference, avoided in practice by large datasets + augmentation).
"""

import numpy as np


def main(steps: int = 300, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax
    from scipy.ndimage import convolve

    from arflow_tpu.config import Config
    from arflow_tpu.losses import MseLoss
    from arflow_tpu.models.uflow_prob import PWCProbFlow

    rng = np.random.RandomState(seed)
    h, w, batch, dx, dy = 128, 160, 8, 3.0, 1.0
    k = np.ones((5, 5)) / 25.0
    pairs1, pairs2 = [], []
    for _ in range(batch):
        base = rng.rand(h + 2, w + 4, 3).astype(np.float32)
        base = np.stack([convolve(base[..., c], k) for c in range(3)], -1)
        pairs1.append(base[:h, :w])
        pairs2.append(base[1 : h + 1, 3 : w + 3])
    img1 = jnp.asarray(np.stack(pairs1))
    img2 = jnp.asarray(np.stack(pairs2))
    gt = jnp.tile(jnp.asarray([dx, dy], jnp.float32), (batch, h, w, 1))

    cfg = Config(
        {
            "type": "mse", "w_mse": 1.0, "w_entropy": 0.01, "diag": True,
            "inv_cov": False, "approx_entropy": False, "n_samples": 1,
            "offdiag_reg": 0.0, "align_corners": False,
        }
    )
    model = PWCProbFlow(out_channels=(2, 2, 0), feature_norm=True)
    loss_fn = MseLoss(cfg)
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    params = variables["params"]
    tx = optax.adam(5e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss(p):
            res = model.apply({"params": p}, img1, img2, with_bk=False)
            out = loss_fn(res, gt, rng=key)
            return out["total"], res["flows_fw"][0][..., :2]

        (l, f0), g = jax.value_and_grad(loss, has_aux=True)(params)
        u, opt2 = tx.update(g, opt, params)
        epe = jnp.mean(jnp.sqrt((f0[..., 0] - dx) ** 2 + (f0[..., 1] - dy) ** 2))
        return optax.apply_updates(params, u), opt2, l, epe

    key = jax.random.PRNGKey(0)
    epe = None
    for i in range(steps):
        params, opt, l, epe = step(params, opt, jax.random.fold_in(key, i))
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(l):.4f} EPE {float(epe):.3f}")
    assert float(epe) < 1.0, f"EPE did not converge: {float(epe)}"
    print("sanity OK")


if __name__ == "__main__":
    main()
