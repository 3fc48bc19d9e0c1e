"""Deferred-metrics NaN guard: a seeded NaN is attributed to its exact step.

The trainer queues device-side step metrics and fetches them in bulk at
print/record boundaries (trainer.py:_queue_step_metrics); the guard must
still name the exact failing iteration when it fires at the flush
(VERDICT round 2, item 9). Reference behavior: per-step
``assert not np.isnan(...)`` in trainer/uflow_trainer.py's epoch loop.
"""

import logging

import numpy as np
import pytest

import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.training.trainer import BaseTrainer
from arflow_tpu.utils.meters import AverageMeter


def _make_trainer(tmp_path):
    cfg = Config(
        {"record_freq": 4, "print_freq": 4, "epoch_size": 10, "seed": 0}
    )
    return BaseTrainer(
        train_loader=None, valid_loader=None, model=None, loss_func=None,
        _log=logging.getLogger("test"), save_root=str(tmp_path), cfg=cfg,
    )


def _queue(trainer, values):
    meters = AverageMeter(i=1)
    names = ["total"]
    bt, dt = AverageMeter(), AverageMeter()
    for i, v in enumerate(values):
        trainer.i_iter = i
        trainer._queue_step_metrics(
            {"total": jnp.float32(v)}, ["total"], 2, i, meters, names, bt, dt
        )
    trainer._flush_metrics(["total"], meters, names, bt, dt)
    return meters


def test_nan_attributed_to_exact_step(tmp_path):
    trainer = _make_trainer(tmp_path)
    # NaN lands at iter 2, inside a flush window (flush fires at iter 4):
    # the deferred guard must still name iter 2, not the flush iter.
    with pytest.raises(FloatingPointError, match="at iter 2 "):
        _queue(trainer, [1.0, 0.9, float("nan"), 0.7, 0.6])


def test_inf_detected(tmp_path):
    trainer = _make_trainer(tmp_path)
    with pytest.raises(FloatingPointError, match="at iter 1 "):
        _queue(trainer, [1.0, float("inf"), 0.5])


def test_finite_run_clean(tmp_path):
    trainer = _make_trainer(tmp_path)
    meters = _queue(trainer, [1.0, 0.9, 0.8, 0.7, 0.6])
    assert np.isclose(meters.avg[0], 0.8)
