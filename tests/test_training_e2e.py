"""End-to-end training smoke tests on the virtual 8-device CPU mesh.

Exercises: data loader -> batch sharding -> jitted train step (model fwd+bwd,
loss, optimizer) -> validation with EPE -> checkpoint save/load.
"""

import logging

import numpy as np
import pytest

import jax

from arflow_tpu.config import Config
from arflow_tpu.data.loader import DataLoader, InMemoryDataset
from arflow_tpu.losses import get_loss
from arflow_tpu.models import get_model
from arflow_tpu.training import get_trainer

B, H, W = 8, 64, 96


def synthetic_samples(rng, n, with_flow=True):
    samples = []
    for _ in range(n):
        img1 = rng.rand(H, W, 3).astype(np.float32)
        img2 = rng.rand(H, W, 3).astype(np.float32)
        s = {
            "img1": img1,
            "img2": img2,
            "img1_ph": np.clip(img1 * 1.1, 0, 1),
            "img2_ph": np.clip(img2 * 1.1, 0, 1),
        }
        if with_flow:
            s["target"] = {
                "flow": (rng.randn(H, W, 2) * 2).astype(np.float32)
            }
        samples.append(s)
    return samples


def make_cfg(trainer, loss_overrides=None, model_overrides=None):
    cfg = Config(
        {
            "trainer": trainer,
            "seed": 0,
            "loss": {
                "type": "uflow",
                "w_census": 1.0,
                "w_smooth": 4.0,
                "smooth_order": 1,
                "edge_constant": 150.0,
                "with_bk": True,
            },
            "model": {"type": "uflow", "feature_norm": True, "level_dropout": 0.1},
            "train": {
                "batch_size": B,
                "epoch_num": 1,
                "epoch_size": 2,
                "valid_size": 1,
                "valid_freq": 1,
                "optim": "adam",
                "lr": 1e-4,
                "beta1": 0.9,
                "beta2": 0.999,
                "eps": 1e-8,
                "weight_decay": 1e-6,
                "bias_decay": 0.0,
                "lr_decay_start_epoch": 100,
                "lr_decay_factor": 0.98,
                "print_freq": 1,
                "record_freq": 1,
                "save_iter": 0,
                "workers": 1,
                "clip": -1.0,
                "seed": 0,
            },
        }
    )
    if loss_overrides:
        cfg.loss.update(loss_overrides)
    if model_overrides:
        cfg.model.update(model_overrides)
    return cfg


def run_trainer(cfg, tmp_path, rng):
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    train_ds = InMemoryDataset(synthetic_samples(rng, 3 * B, with_flow=False))
    valid_ds = InMemoryDataset(synthetic_samples(rng, 2, with_flow=True))
    train_loader = DataLoader(train_ds, batch_size=B, shuffle=True, drop_last=True)
    valid_loader = [DataLoader(valid_ds, batch_size=1)]

    model = get_model(cfg.model)
    loss = get_loss(cfg.loss)
    log = logging.getLogger("test")
    trainer = get_trainer(cfg.trainer)(
        train_loader, valid_loader, model, loss, log, str(tmp_path),
        cfg.train, model_cfg=cfg.model, full_cfg=cfg,
    )
    trainer.train()
    return trainer


def test_uflow_trainer_e2e(tmp_path, rng):
    cfg = make_cfg("uflow")
    trainer = run_trainer(cfg, tmp_path, rng)
    assert trainer.i_iter >= 2
    assert trainer.best_error < np.inf  # validation ran and saved a checkpoint
    ckpts = list(tmp_path.glob("Chairs_*"))
    assert ckpts, "checkpoint was not written"
    # Params identical after save/load round trip.
    from arflow_tpu.training.checkpoint import load_checkpoint

    state = load_checkpoint(str(tmp_path / "Chairs_ckpt.msgpack"))
    restored = state["params"]
    orig = jax.device_get(trainer.state["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored,
        orig,
    )
@pytest.mark.slow
def test_uflow_trainer_device_aug_e2e(tmp_path, rng):
    """Photometric aug flagged "device": true runs inside the jitted train
    step; the loader ships no _ph copies and training still converges/steps."""
    cfg = make_cfg("uflow")
    cfg["data"] = [
        {
            "type": "train",
            "name": "Chairs",
            "photometric_aug": {
                "hue": 0.5, "swap_channels": True, "device": True,
            },
        }
    ]
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    # No _ph keys at all: device aug must not depend on them.
    train_samples = synthetic_samples(rng, 2 * B, with_flow=False)
    for s in train_samples:
        del s["img1_ph"], s["img2_ph"]
    train_loader = DataLoader(
        InMemoryDataset(train_samples), batch_size=B, drop_last=True
    )
    valid_loader = [
        DataLoader(InMemoryDataset(synthetic_samples(rng, 2)), batch_size=1)
    ]
    model = get_model(cfg.model)
    loss = get_loss(cfg.loss)
    trainer = get_trainer(cfg.trainer)(
        train_loader, valid_loader, model, loss, logging.getLogger("test"),
        str(tmp_path), cfg.train, model_cfg=cfg.model, full_cfg=cfg,
    )
    assert trainer._device_photometric() is not None
    trainer.train()
    assert trainer.i_iter >= 2
    assert trainer.best_error < np.inf
@pytest.mark.slow
def test_sharded_validation_matches_batch1(tmp_path, rng):
    """Validation shards batched eval over the mesh (padding the remainder);
    EPE must match the batch-1 reference numerics to float noise."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    cfg = make_cfg("uflow", model_overrides={"level_dropout": 0.0})
    valid_samples = synthetic_samples(rng, 5, with_flow=True)  # 5 % 8 != 0
    train_ds = InMemoryDataset(synthetic_samples(rng, B, with_flow=False))

    def build(valid_batch):
        cfg.train.valid_size = 10
        trainer = get_trainer(cfg.trainer)(
            DataLoader(train_ds, batch_size=B, drop_last=True),
            [DataLoader(InMemoryDataset(valid_samples), batch_size=valid_batch)],
            get_model(cfg.model), get_loss(cfg.loss),
            logging.getLogger("test"), str(tmp_path), cfg.train,
            model_cfg=cfg.model, full_cfg=cfg,
        )
        first = next(iter(trainer.train_loader))
        trainer._ensure_init({"img1": first["img1"], "img2": first["img2"]})
        return trainer

    t1 = build(1)
    errs1, names1 = t1._validate_with_gt()
    t5 = build(5)  # one padded batch of 5 -> 8
    errs5, names5 = t5._validate_with_gt()
    assert names1 == names5
    np.testing.assert_allclose(errs1, errs5, rtol=1e-4, atol=1e-5)
@pytest.mark.slow
def test_mse_supervised_trainer_e2e(tmp_path, rng):
    """Supervised path end-to-end: GT flow in the train stream, MseLoss
    (nondiag inv_cov, the chairs_uflow_mse.json parametrization), EPE
    validation. The reference ships this config but cannot train it
    (trainer/get_trainer.py lacks "ChairsMse")."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    cfg = make_cfg(
        "mse",
        loss_overrides={
            "type": "mse",
            "w_mse": 1.0,
            "w_entropy": 0.1,
            "diag": False,
            # Without diagonal dominance the random-init triangular solve
            # blows up geometrically (DIVERGENCES.md #22).
            "diag_dominant": True,
            "inv_cov": True,
            "approx_entropy": False,
            "offdiag_reg": 1000.0,
            "n_samples": 1,
            "align_corners": False,
        },
        model_overrides={
            "type": "uflow_prob",
            "out_channels": 8,
            "inv_cov": True,
            "n_pyramids": 1,
            "mixture_weights": False,
        },
    )
    train_loader = DataLoader(
        InMemoryDataset(synthetic_samples(rng, 3 * B, with_flow=True)),
        batch_size=B, shuffle=True, drop_last=True,
    )
    valid_loader = [
        DataLoader(InMemoryDataset(synthetic_samples(rng, 2)), batch_size=1)
    ]
    model = get_model(cfg.model)
    loss = get_loss(cfg.loss)
    trainer = get_trainer(cfg.trainer)(
        train_loader, valid_loader, model, loss, logging.getLogger("test"),
        str(tmp_path), cfg.train, model_cfg=cfg.model, full_cfg=cfg,
    )
    trainer.train()
    assert trainer.i_iter >= 2
    assert trainer.best_error < np.inf
    assert list(tmp_path.glob("Chairs_*")), "no checkpoint written"
@pytest.mark.slow
def test_uflow_elbo_trainer_e2e(tmp_path, rng):
    cfg = make_cfg(
        "uflow_elbo",
        loss_overrides={
            "type": "uflow_elbo",
            "edge_asymp": 0.01,
            "order_smooth": 1,
            "isotropic_smooth": True,
            "penalty_smooth": "charbonnier",
            "closed_form_smooth": True,
            "data_loss": ["census"],
            "data_weight": [1.0],
            "data_penalty": ["abs_robust_loss"],
            "w_entropy": 0.1,
            "w_oof": 0.0,
            "w_occ": 0.0,
            "approx": "diag",
            "n_components": 1,
            "inv_cov": False,
            "approx_entropy": False,
            "occ_type": "sample",
            "n_samples": 1,
            "offdiag_reg": 0.0,
            "natural_grad": False,
        },
        model_overrides={
            "type": "uflow_prob",
            "out_channels": [2, 2, 0],
            "inv_cov": False,
            "n_pyramids": 1,
            "mixture_weights": False,
        },
    )
    cfg.train.track_auc = True
    cfg.train.sp_samples = 10
    trainer = run_trainer(cfg, tmp_path, rng)
    assert trainer.i_iter >= 2
    assert trainer.best_error < np.inf
@pytest.mark.slow
def test_uflow_elbo_mixture_trainer_e2e(tmp_path, rng):
    """Mixture posterior (n_components=2, MixtureWeightsNet): per-component
    prediction images with the predicted weight drawn on land in the summary
    (reference trainer/uflow_elbo_trainer.py:241-257)."""
    cfg = make_cfg(
        "uflow_elbo",
        loss_overrides={
            "type": "uflow_elbo",
            "edge_asymp": 0.01,
            "penalty_smooth": "charbonnier",
            "closed_form_smooth": False,
            "isotropic_smooth": False,
            "data_loss": ["census"],
            "data_weight": [1.0],
            "data_penalty": ["abs_robust_loss"],
            "w_entropy": 0.3,
            "w_oof": 0.0,
            "w_occ": 0.0,
            "approx": "mixture",
            "n_components": 2,
            "inv_cov": False,
            "approx_entropy": False,
            "occ_type": "sample",
            "n_samples": 2,
            "offdiag_reg": 0.0,
            "natural_grad": False,
        },
        model_overrides={
            "type": "uflow_prob",
            "out_channels": [2, 2, 0],
            "inv_cov": False,
            "n_pyramids": 2,
            "mixture_weights": True,
        },
    )
    trainer = run_trainer(cfg, tmp_path, rng)
    assert trainer.i_iter >= 2
    import json as _json

    events = [
        _json.loads(line)
        for line in (tmp_path / "events.jsonl").read_text().splitlines()
    ]
    image_tags = {e["tag"] for e in events if "image" in e}
    # one flow image per mixture component, for each validation sample
    assert any(t.startswith("Valid/pred_0_0/") for t in image_tags), image_tags
    assert any(t.startswith("Valid/pred_0_1/") for t in image_tags), image_tags
@pytest.mark.slow
def test_uflow_elbo_sparse_trainer_e2e(tmp_path, rng):
    """Sparse-triangular posterior: exercises matrix_vector_product_general
    inside the jitted train step (configs/chairs_uflow_elbo_nondiag.json)."""
    cov_supp = 1
    n_off = (cov_supp + 1) ** 2 - 1
    cfg = make_cfg(
        "uflow_elbo",
        loss_overrides={
            "type": "uflow_elbo",
            "edge_asymp": 0.01,
            "penalty_smooth": "charbonnier",
            "closed_form_smooth": False,
            "data_loss": ["census"],
            "data_weight": [1.0],
            "data_penalty": ["abs_robust_loss"],
            "w_entropy": 0.1,
            "w_oof": 0.0,
            "w_occ": 0.0,
            "approx": "sparse",
            "cov_supp": cov_supp,
            "n_components": 1,
            "inv_cov": False,
            "approx_entropy": False,
            "occ_type": "sample",
            "n_samples": 2,
            "offdiag_reg": 0.1,
            "natural_grad": False,
            "isotropic_smooth": False,
        },
        model_overrides={
            "type": "uflow_prob",
            "out_channels": [2, 2, 2 * n_off],
            "inv_cov": False,
            "n_pyramids": 1,
            "mixture_weights": False,
        },
    )
    cfg.train.clip = 1.0  # exercise gradient clipping in the optax chain
    trainer = run_trainer(cfg, tmp_path, rng)
    assert trainer.i_iter >= 2
