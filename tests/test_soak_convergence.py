"""Dataset-scale convergence + kill-and-resume soak (round-3 verdict weak #3).

A generated on-disk dataset in the EXACT FlyingChairs layout (PPM frames +
.flo GT, loaded through the real ``Chairs`` class incl. the fork's hardcoded
val split, the native PPM decoder and the threaded loader) is trained
multi-epoch with validation:

  * held-out EPE decreases across epochs (real learning on unseen pairs),
  * the exponential LR decay engages at ``lr_decay_start_epoch``,
  * the best-checkpoint copy rotates to the best validation epoch,
  * a run killed after 2 of 4 epochs and resumed via ``cfg.train.resume``
    finishes BIT-IDENTICAL to the unbroken 4-epoch run (params and
    optimizer moments), pinning checkpoint completeness + epoch-pinned
    loader shuffling + iter-derived step RNG.
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

log = logging.getLogger("soak")


def _make_cfg(epoch_num):
    return Config({
        "trainer": "mse",
        "loss": {
            "type": "mse", "w_mse": 1.0, "w_entropy": 0.1, "diag": True,
            "diag_dominant": False, "inv_cov": False,
            "approx_entropy": False, "offdiag_reg": 0.0, "n_samples": 1,
            "align_corners": False,
        },
        "model": {
            "type": "uflow_prob", "feature_norm": True, "level_dropout": 0.0,
            "out_channels": [2, 2, 0], "inv_cov": False, "n_pyramids": 1,
            "mixture_weights": False,
        },
        "train": {
            "batch_size": B, "epoch_num": epoch_num, "epoch_size": 1000,
            "valid_size": 1000, "valid_freq": 1, "optim": "adam",
            "lr": 4e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1e-8,
            "weight_decay": 0.0, "bias_decay": 0.0,
            "lr_decay_start_epoch": 3, "lr_decay_factor": 0.5,
            "print_freq": 100, "record_freq": 1, "save_iter": 0,
            "workers": 2, "clip": -1.0, "seed": 0,
        },
    })


def _build_trainer(cfg, root, save_root):
    train_ds = Chairs(root, split="train")
    valid_ds = Chairs(root, split="valid")
    assert len(valid_ds) == 6 and len(train_ds) == N_PAIRS - 6
    train_loader = DataLoader(train_ds, batch_size=B, shuffle=True,
                              drop_last=True, num_workers=2, seed=0)
    valid_loader = [DataLoader(valid_ds, batch_size=2, num_workers=2)]
    model = get_model(cfg.model)
    loss = get_loss(cfg.loss)
    return get_trainer(cfg.trainer)(
        train_loader, valid_loader, model, loss, log, str(save_root),
        cfg.train, model_cfg=cfg.model, full_cfg=cfg,
    )


def _valid_epes(save_root):
    epes = []
    with open(save_root / "events.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "Valid_EPE_0":
                epes.append((rec["step"], rec["value"]))
    return [v for _, v in sorted(epes)]


def _params_np(trainer):
    return jax.device_get(trainer.state["params"])


def _assert_trees_equal(a, b, what):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=what
        ),
        a, b,
    )


@pytest.mark.slow
def test_soak_convergence_and_bitwise_resume(tmp_path, rng):
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    root = str(tmp_path / "chairs")
    generate_chairs(root, n_pairs=N_PAIRS, size=(H, W), max_flow=5.0, seed=3)

    # --- run A: unbroken 4 epochs -------------------------------------------
    cfg = _make_cfg(epoch_num=4)
    save_a = tmp_path / "runA"
    tr_a = _build_trainer(cfg, root, save_a)
    tr_a.train()
    epes_a = _valid_epes(save_a)
    assert len(epes_a) == 4, epes_a
    log.info("held-out EPE per epoch: %s", epes_a)
    # Held-out EPE decreases: real learning on unseen pairs.
    assert epes_a[-1] < 0.8 * epes_a[0], epes_a
    assert min(epes_a) == tr_a.best_error

    # Best-checkpoint rotation: the best copy holds the best-epoch params —
    # when the best epoch is the last one, it must equal the latest ckpt.
    from arflow_tpu.training.checkpoint import load_checkpoint

    best = load_checkpoint(str(save_a / "Chairs_model_best.msgpack"))
    assert float(best["best_error"]) == tr_a.best_error
    if epes_a.index(min(epes_a)) == len(epes_a) - 1:
        _assert_trees_equal(best["params"], _params_np(tr_a),
                            "best copy != final params for best-last run")

    # LR decay engaged: 7 steps/epoch drop_last, 4 epochs -> 28 steps; the
    # schedule the trainer built halves the LR from epoch 3 on.
    steps_per_epoch = (N_PAIRS - 6) // B
    n_steps = int(jax.device_get(tr_a.state["step"]))
    assert n_steps == 4 * steps_per_epoch
    sched = lr_schedule(cfg.train, steps_per_epoch)
    assert float(sched(0)) == cfg.train.lr
    assert float(sched(n_steps - 1)) == pytest.approx(cfg.train.lr * 0.5)

    # --- run B: killed after 2 epochs, resumed to 4 -------------------------
    cfg_b = _make_cfg(epoch_num=2)
    save_b = tmp_path / "runB"
    tr_b = _build_trainer(cfg_b, root, save_b)
    tr_b.train()
    assert tr_b.i_epoch == 2

    cfg_c = _make_cfg(epoch_num=4)
    cfg_c.train.resume = str(save_b / "Chairs_ckpt.msgpack")
    save_c = tmp_path / "runC"
    tr_c = _build_trainer(cfg_c, root, save_c)
    tr_c.train()
    assert tr_c.i_epoch == 4
    assert int(jax.device_get(tr_c.state["step"])) == n_steps

    # Bitwise: params AND optimizer moments identical to the unbroken run.
    _assert_trees_equal(_params_np(tr_c), _params_np(tr_a),
                        "resumed params != unbroken params")
    _assert_trees_equal(
        jax.device_get(tr_c.state["opt_state"]),
        jax.device_get(tr_a.state["opt_state"]),
        "resumed opt_state != unbroken opt_state",
    )
    # And the resumed run continues the SAME validation trajectory.
    epes_c = _valid_epes(save_c)
    np.testing.assert_allclose(epes_c, epes_a[2:], rtol=0, atol=0)
