"""Scheduled loss-config switch (reference: trainer/uflow_trainer.py:26-28).

At cfg.stage1.epoch the loss config mutates and the jitted train step is
rebuilt (the loss cfg is closure-static under jit)."""

import logging

import numpy as np
import pytest

import jax

from tests.test_training_e2e import make_cfg, run_trainer, synthetic_samples
from arflow_tpu.config import Config
from arflow_tpu.data.loader import DataLoader, InMemoryDataset
from arflow_tpu.losses import get_loss
from arflow_tpu.models import get_model
from arflow_tpu.training import get_trainer
@pytest.mark.slow
def test_stage1_loss_switch(tmp_path, rng):
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    cfg = make_cfg("uflow")
    cfg.train.epoch_num = 2
    cfg.train.valid_freq = 10**9  # no validation
    cfg.stage1 = Config({"epoch": 1, "loss": {"w_smooth": 0.0}})

    train_ds = InMemoryDataset(synthetic_samples(rng, 2 * 8, with_flow=False))
    loader = DataLoader(train_ds, batch_size=8, drop_last=True)
    model = get_model(cfg.model)
    loss = get_loss(cfg.loss)
    trainer = get_trainer("uflow")(
        loader, [], model, loss, logging.getLogger("t"), str(tmp_path),
        cfg.train, model_cfg=cfg.model, full_cfg=cfg,
    )
    trainer._run_one_epoch()
    step_before = trainer._train_step
    assert trainer.loss_func.cfg.w_smooth == 4.0
    trainer._run_one_epoch()  # i_epoch == 1 -> switch fires
    assert trainer.loss_func.cfg.w_smooth == 0.0
    assert trainer._train_step is not step_before  # step was rebuilt
