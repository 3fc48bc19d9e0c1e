"""Device-side NaN step revert (cfg.train.nan_revert).

The working version of the reference's disabled revert-last-step-on-NaN
mechanism (uflow_elbo_trainer.py:77-86, commented out there): a non-finite
loss/grad discards the whole update inside the jitted step — params,
opt_state and batch_stats keep their previous values via a device select,
no host sync or checkpoint reload — and training continues.
"""

import logging

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.training.trainer import BaseTrainer, apply_updates_step
from arflow_tpu.utils.meters import AverageMeter


def _tiny_state():
    params = {"w": jnp.ones((3,), jnp.float32)}
    tx = optax.sgd(0.1)
    return tx, {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
        "nan_skips": jnp.zeros((), jnp.int32),
    }


def test_finite_step_applies():
    tx, state = _tiny_state()
    grads = {"w": jnp.full((3,), 2.0)}
    new = apply_updates_step(tx, state, grads, total=jnp.float32(1.0),
                             revert_nonfinite=True)
    np.testing.assert_allclose(np.asarray(new["params"]["w"]), 0.8)
    assert int(new["nan_skips"]) == 0
    assert int(new["step"]) == 1


def test_nonfinite_loss_reverts():
    tx, state = _tiny_state()
    grads = {"w": jnp.full((3,), 2.0)}
    new = apply_updates_step(tx, state, grads, total=jnp.float32(np.nan),
                             revert_nonfinite=True)
    np.testing.assert_array_equal(np.asarray(new["params"]["w"]), 1.0)
    assert int(new["nan_skips"]) == 1
    # step still advances (the batch was consumed)
    assert int(new["step"]) == 1


def test_nonfinite_grads_revert_even_with_finite_loss():
    tx, state = _tiny_state()
    grads = {"w": jnp.asarray([1.0, np.inf, 1.0], jnp.float32)}
    new = apply_updates_step(tx, state, grads, total=jnp.float32(0.5),
                             revert_nonfinite=True)
    np.testing.assert_array_equal(np.asarray(new["params"]["w"]), 1.0)
    assert int(new["nan_skips"]) == 1


def test_revert_inside_jit_chain():
    """Poisoned step in the middle of a jitted sequence leaves the final
    params equal to a run without it."""
    tx, state = _tiny_state()

    @jax.jit
    def step(state, g, total):
        return apply_updates_step(tx, state, {"w": g}, total=total,
                                  revert_nonfinite=True)

    g = jnp.full((3,), 1.0)
    s = step(state, g, jnp.float32(1.0))
    s = step(s, jnp.full((3,), np.nan), jnp.float32(np.nan))
    s = step(s, g, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s["params"]["w"]), 0.8, rtol=1e-6)
    assert int(s["nan_skips"]) == 1
    assert int(s["step"]) == 3


def _flush_harness(tmp_path, nan_revert):
    cfg = Config({"record_freq": 4, "print_freq": 4, "epoch_size": 10,
                  "seed": 0, "nan_revert": nan_revert})
    trainer = BaseTrainer(
        train_loader=None, valid_loader=None, model=None, loss_func=None,
        _log=logging.getLogger("test"), save_root=str(tmp_path), cfg=cfg,
    )
    meters = AverageMeter(i=1)
    bt, dt = AverageMeter(), AverageMeter()
    for i, v in enumerate([1.0, float("nan"), 0.5]):
        trainer.i_iter = i
        trainer._queue_step_metrics(
            {"total": jnp.float32(v)}, ["total"], 2, i, meters, ["total"],
            bt, dt,
        )
    trainer._flush_metrics(["total"], meters, ["total"], bt, dt)
    return meters


def test_flush_warns_instead_of_raising(tmp_path, caplog):
    with caplog.at_level(logging.WARNING, logger="test"):
        meters = _flush_harness(tmp_path, nan_revert=True)
    assert any("reverted" in r.message for r in caplog.records)
    # the NaN row stays out of the meters
    assert np.isclose(meters.avg[0], 0.75)


def test_flush_still_raises_by_default(tmp_path):
    with pytest.raises(FloatingPointError, match="at iter 1 "):
        _flush_harness(tmp_path, nan_revert=False)
@pytest.mark.slow
def test_uflow_trainer_survives_poisoned_batch(tmp_path, rng):
    """Full-trainer wiring: a batch of NaN images produces a non-finite loss;
    with nan_revert the epoch completes, the step is counted in nan_skips and
    the params stay finite."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")

    from tests.test_training_e2e import make_cfg, synthetic_samples
    from arflow_tpu.data.loader import DataLoader, InMemoryDataset
    from arflow_tpu.losses import get_loss
    from arflow_tpu.models import get_model
    from arflow_tpu.training import get_trainer

    B = 8
    cfg = make_cfg("uflow")
    cfg.train.nan_revert = True
    cfg.train.epoch_size = 2

    samples = synthetic_samples(rng, 2 * B, with_flow=False)
    for s in samples[:B]:  # poison the entire first batch
        s["img1_ph"] = np.full_like(s["img1_ph"], np.nan)
    train_loader = DataLoader(
        InMemoryDataset(samples), batch_size=B, shuffle=False, drop_last=True
    )
    valid_ds = InMemoryDataset(synthetic_samples(rng, 2, with_flow=True))
    trainer = get_trainer(cfg.trainer)(
        train_loader, [DataLoader(valid_ds, batch_size=1)],
        get_model(cfg.model), get_loss(cfg.loss),
        logging.getLogger("test"), str(tmp_path), cfg.train,
        model_cfg=cfg.model, full_cfg=cfg,
    )
    trainer.train()

    assert int(jax.device_get(trainer.state["nan_skips"])) == 1
    finite = jax.tree_util.tree_reduce(
        lambda acc, p: acc and bool(np.all(np.isfinite(np.asarray(p)))),
        jax.device_get(trainer.state["params"]), True,
    )
    assert finite
