"""``train.remat``: activation rematerialization is numerically a no-op.

``jax.checkpoint`` around the model forward recomputes activations in the
backward pass (HBM for FLOPs); params after one step must be identical
with the flag on and off, through the real trainer step builders.
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.data.loader import DataLoader, InMemoryDataset
from arflow_tpu.losses import get_loss
from arflow_tpu.models import get_model
from arflow_tpu.training import get_trainer

TRAIN_CFG = {
    "batch_size": 8, "epoch_num": 1, "epoch_size": 1, "valid_size": 0,
    "valid_freq": 10**9, "optim": "adam", "lr": 1e-4, "beta1": 0.9,
    "beta2": 0.999, "eps": 1e-8, "weight_decay": 1e-6, "bias_decay": 0.0,
    "lr_decay_start_epoch": 100, "lr_decay_factor": 0.98, "print_freq": 1,
    "record_freq": 1, "save_iter": 10**9, "workers": 1, "clip": -1.0,
    "seed": 0,
}


def _samples(rng, n, h=64, w=96):
    out = []
    for _ in range(n):
        i1 = rng.rand(h, w, 3).astype(np.float32)
        i2 = rng.rand(h, w, 3).astype(np.float32)
        out.append({"img1": i1, "img2": i2, "img1_ph": i1, "img2_ph": i2,
                    "target": {"flow": rng.randn(h, w, 2).astype(np.float32)}})
    return out


def _run_one_step(tmp_path, rng_data, remat: bool):
    cfg = Config(dict(TRAIN_CFG, remat=remat))
    model_cfg = Config(
        {"type": "uflow", "feature_norm": True, "level_dropout": 0.0}
    )
    loss_cfg = Config({
        "type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
        "smooth_order": 1, "edge_constant": 150.0, "with_bk": True,
    })
    loader = DataLoader(
        InMemoryDataset(_samples(rng_data, 8)), batch_size=8, drop_last=True
    )
    trainer = get_trainer("uflow")(
        loader, [], get_model(model_cfg), get_loss(loss_cfg),
        logging.getLogger("remat"), str(tmp_path / f"remat{remat}"),
        cfg, model_cfg=model_cfg, full_cfg=Config({"loss": loss_cfg}),
    )
    trainer._run_one_epoch()
    jax.block_until_ready(trainer.state["params"])
    return jax.tree_util.tree_map(np.asarray, trainer.state["params"])
@pytest.mark.slow
def test_remat_grads_match(rng):
    """Direct check: jax.checkpoint around the forward leaves gradients
    within float-reassociation noise of the plain program."""
    from arflow_tpu.models import get_model

    model = get_model(Config(
        {"type": "uflow", "feature_norm": True, "level_dropout": 0.0}
    ))
    loss = get_loss(Config({
        "type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
        "smooth_order": 1, "edge_constant": 150.0, "with_bk": True,
    }))
    im1 = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    variables = jax.jit(lambda r: model.init(r, im1, im2, with_bk=True))(
        jax.random.PRNGKey(0))

    def fwd(p, a, b):
        return model.apply({"params": p}, a, b, with_bk=True)

    def make_loss(f):
        return lambda p: loss(f(p, im1, im2), im1, im2)["total"]

    l0, g0 = jax.jit(jax.value_and_grad(make_loss(fwd)))(variables["params"])
    l1, g1 = jax.jit(jax.value_and_grad(make_loss(jax.checkpoint(fwd))))(
        variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        # float reassociation in the recomputed forward (different
        # fusion/reduction order in f32) wobbles individual entries by up
        # to ~0.6% of the leaf scale — assert leaf-scale agreement: the
        # relative L2 error and the max deviation in units of the leaf's
        # RMS are both ~1% or less. The loss matches to 1e-6 relative.
        # The rel-L2 bound is HOST-DEPENDENT: XLA:CPU codegen (which
        # vector ISA it targets — AVX-512/AMX availability) changes the
        # reduction order, so the worst leaf measured 6e-4 on the round-4
        # calibration host but a deterministic 1.22e-3 on the round-5
        # host; 3e-3 bounds reassociation noise on both while still
        # failing hard on any real remat bug (which shows up at
        # percent-to-100% scale).
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = np.sqrt(np.mean(a * a)) + 1e-12
        rel_l2 = np.sqrt(np.mean((a - b) ** 2)) / scale
        max_dev = np.max(np.abs(a - b)) / scale
        assert rel_l2 < 3e-3, rel_l2
        # single small entries wobble harder relative to the leaf RMS
        # (measured max ~1.3%); the aggregate bound above is the
        # meaningful one.
        assert max_dev < 5e-2, max_dev
@pytest.mark.slow
def test_remat_trainer_step_matches(tmp_path):
    """Through the real trainer step builders: params after one Adam step
    agree up to Adam's amplification of float-reassociation noise
    (grad/sqrt(v) near zero-crossing grads; tolerance ~ lr)."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    p_off = _run_one_step(tmp_path, np.random.RandomState(7), remat=False)
    p_on = _run_one_step(tmp_path, np.random.RandomState(7), remat=True)
    flat_off = jax.tree_util.tree_leaves(p_off)
    flat_on = jax.tree_util.tree_leaves(p_on)
    assert len(flat_off) == len(flat_on) > 0
    for a, b in zip(flat_off, flat_on):
        np.testing.assert_allclose(a, b, atol=5e-4)
