"""cfg.train.wfold: opting the TRAINING step into the W-folded pyramid.

Round-4 verdict #2(c): the W-fold's parameter-gradient parity is pinned
(test_wfold_pyramid.py::test_wfold_kernel_grads_match_direct); this file
pins (1) the config gate itself and (2) a trajectory divergence bound —
fold-on training follows the fold-off trajectory within the tolerance the
fold's summation-order freedom implies, at the chaos-bounded lr used by the
lockstep tests (DIVERGENCES #31: trajectory noise amplifies ~30-70x/step at
production lr; semantics still surface at O(lr)).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from arflow_tpu.config import Config
from arflow_tpu.losses import get_loss
from arflow_tpu.models import get_model


def test_cfg_wfold_sets_trace_gate(tmp_path, monkeypatch):
    from arflow_tpu.training.mse_trainer import MseTrainer

    monkeypatch.delenv("ARFLOW_WFOLD_PYR", raising=False)
    cfg = Config({
        "batch_size": 2, "epoch_num": 1, "epoch_size": 1, "valid_size": 1,
        "valid_freq": 1, "optim": "adam", "lr": 1e-4, "beta1": 0.9,
        "beta2": 0.999, "eps": 1e-8, "weight_decay": 0.0, "bias_decay": 0.0,
        "lr_decay_start_epoch": 1, "lr_decay_factor": 0.5, "print_freq": 1,
        "record_freq": 1, "save_iter": 0, "workers": 0, "clip": -1.0,
        "seed": 0, "wfold": True,
    })
    import logging

    MseTrainer([], [], None, None, logging.getLogger("t"), str(tmp_path),
               cfg)
    assert os.environ.get("ARFLOW_WFOLD_PYR") == "1"

    cfg.wfold = False
    MseTrainer([], [], None, None, logging.getLogger("t"), str(tmp_path),
               cfg)
    assert os.environ.get("ARFLOW_WFOLD_PYR") == "0"


@pytest.mark.slow
def test_wfold_training_trajectory_bound(rng, monkeypatch):
    """10 uflow train steps, fold-on vs fold-off, identical init/data.

    The fold computes the same sums in a different MXU summation order, so
    trajectories are not byte-identical; this pins the documented bound at
    lr=1e-7 (the lockstep tests' chaos-bounded rate): per-step losses match
    to 1e-5 relative and final params to 1e-6 absolute."""
    h, w = 64, 96
    img1 = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32))

    loss_fn = get_loss(Config({
        "type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
        "smooth_order": 1, "edge_constant": 150.0, "with_bk": True,
    }))

    trajectories = {}
    for wfold in ("0", "1"):
        monkeypatch.setenv("ARFLOW_WFOLD_PYR", wfold)
        model = get_model(Config({
            "type": "uflow", "feature_norm": True, "level_dropout": 0.0,
        }))
        params = jax.jit(
            lambda r, _m=model: _m.init(r, img1, img2, with_bk=True)
        )(jax.random.PRNGKey(0))["params"]
        tx = optax.adam(1e-7)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, _m=model):
            def lf(pp):
                res = _m.apply(
                    {"params": pp}, img1, img2, with_bk=True, train=True
                )
                return loss_fn(res, img1, img2)["total"]

            l, g = jax.value_and_grad(lf)(p)
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2, l

        losses = []
        for _ in range(10):
            params, opt, l = step(params, opt)
            losses.append(float(l))
        trajectories[wfold] = (losses, jax.device_get(params))

    l_off, p_off = trajectories["0"]
    l_on, p_on = trajectories["1"]
    np.testing.assert_allclose(l_on, l_off, rtol=1e-5, atol=0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
        ),
        p_on, p_off,
    )
