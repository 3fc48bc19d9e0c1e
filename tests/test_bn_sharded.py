"""MixtureWeightsNet BatchNorm under data parallelism.

Round-1 worry (NOTES_ROUND1.md): are BN batch stats per-device under the
mesh? No — unlike pmap, jit+GSPMD semantics are global: the BN mean/var
reductions are written over the full batch axis and XLA inserts the
cross-device collectives, so sharded and single-device training see the
SAME statistics. (The reference's torch DataParallel computes BN
per-replica, models/uflow_prob_model.py BN layers — ours is strictly
stronger.) This test pins the equivalence to reduction-order noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.models import get_model
from arflow_tpu.parallel import make_mesh, replicate, shard_batch

B, H, W = 8, 64, 96


def test_batch_stats_global_under_sharding(rng):
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    model = get_model(
        Config(
            {
                "type": "uflow_prob", "out_channels": [2, 2, 0],
                "inv_cov": False, "n_pyramids": 2, "mixture_weights": True,
                "feature_norm": True, "level_dropout": 0.0,
            }
        )
    )
    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    v = jax.jit(lambda r, a, b: model.init(r, a, b, with_bk=True, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img1[:1], img2[:1],
    )

    def run(variables, a, b):
        _, mut = model.apply(
            variables, a, b, with_bk=True, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    bs_single = jax.device_get(jax.jit(run)(v, jnp.asarray(img1), jnp.asarray(img2)))

    mesh = make_mesh()
    v_rep = replicate(mesh, v)
    sb = shard_batch(mesh, {"img1": img1, "img2": img2})
    bs_shard = jax.device_get(jax.jit(run)(v_rep, sb["img1"], sb["img2"]))

    # Identical up to float reduction order. Per-device stats would differ
    # by O(1): each 1-sample shard has a very different batch mean.
    for a, b in zip(
        jax.tree_util.tree_leaves(bs_single), jax.tree_util.tree_leaves(bs_shard)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
