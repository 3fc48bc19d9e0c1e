"""Learning smoke test: the jitted train step reduces the UFlow loss on a
synthetic translating pattern (catches sign/gradient wiring errors that
parity tests of isolated pieces cannot)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from arflow_tpu.config import Config
from arflow_tpu.losses import UFlowLoss
from arflow_tpu.models.uflow import PWCFlow


def _shifted_pair(rng, h, w, dx=2):
    base = rng.rand(h, w + dx, 3).astype(np.float32)
    # smooth it so census has gradients to work with
    k = np.ones((3, 3)) / 9.0
    from scipy.ndimage import convolve

    base = np.stack([convolve(base[..., c], k) for c in range(3)], -1)
    img1 = base[:, :w]
    img2 = base[:, dx : w + dx]
    return img1[None], img2[None]


@pytest.mark.slow
def test_uflow_training_reduces_loss(rng):
    h, w = 64, 96
    img1, img2 = _shifted_pair(rng, h, w)
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2)

    cfg = Config(
        {
            "type": "uflow",
            "w_census": 1.0,
            "w_smooth": 2.0,
            "smooth_order": 1,
            "edge_constant": 150.0,
            "with_bk": True,
        }
    )
    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    loss_fn = UFlowLoss(cfg)
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=True))(
        jax.random.PRNGKey(0)
    )
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            res = model.apply({"params": p}, img1, img2, with_bk=True)
            return loss_fn(res, img1, img2)["total"]

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    losses = []
    for _ in range(30):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    # At lr 1e-3 the census loss collapses by >10x within ~10 steps.
    assert losses[-1] < losses[0] * 0.5, losses
