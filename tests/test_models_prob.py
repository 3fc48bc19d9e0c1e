"""Parity tests: PWCProbFlow / ComponentNet / ResNet vs reference torch."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import import_reference
from arflow_tpu.config import Config
from arflow_tpu.models.uflow_prob import ComponentNet, PWCProbFlow, ResNet
from arflow_tpu.models.torch_import import (
    import_component_net,
    import_resnet,
    import_uflow_prob,
)

prob_ref = import_reference("models.uflow_prob_model")

B, H, W = 1, 160, 160


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _compare_levels(ours, theirs, key, atol=3e-4):
    assert len(ours) == len(theirs), key
    for lvl, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(
            np.asarray(o), _nhwc(t), atol=atol, rtol=2e-3,
            err_msg=f"{key} level {lvl}",
        )


def prob_cfg(**over):
    base = {
        "feature_norm": True,
        "level_dropout": 0.0,
        "out_channels": [2, 2, 0],
        "inv_cov": False,
        "n_pyramids": 1,
        "mixture_weights": False,
    }
    base.update(over)
    return Config(base)


@pytest.mark.slow
@pytest.mark.parametrize(
    "out_channels,inv_cov,n_pyramids",
    [([2, 2, 0], False, 1), ([2, 2, 6], False, 1), ([2, 2, 0], True, 1),
     ([2, 2, 0], False, 2)],
)
def test_pwc_prob_flow_parity(rng, out_channels, inv_cov, n_pyramids):
    torch.manual_seed(0)
    cfg = prob_cfg(
        out_channels=out_channels, inv_cov=inv_cov, n_pyramids=n_pyramids
    )
    ref = prob_ref.PWCProbFlow(cfg)
    ref.eval()
    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_nchw(img1), _nchw(img2), with_bk=False)

    model = PWCProbFlow(
        out_channels=tuple(out_channels),
        inv_cov=inv_cov,
        n_pyramids=n_pyramids,
        feature_norm=True,
        level_dropout=0.0,
    )
    params = import_uflow_prob(ref.state_dict(), n_pyramids=n_pyramids)
    out = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b, with_bk=False)
    )(params, jnp.asarray(img1), jnp.asarray(img2))
    _compare_levels(out["flows_fw"], ref_out["flows_fw"], "flows_fw")


@pytest.mark.slow
def test_component_net_parity(rng):
    torch.manual_seed(0)
    cfg = prob_cfg(out_channels=[2, 2, 0], mixture_weights=False)
    ref = prob_ref.ComponentNet(cfg)
    ref.eval()
    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_nchw(img1), _nchw(img2), with_bk=True)

    model = ComponentNet(
        out_channels=(2, 2, 0), feature_norm=True, level_dropout=0.0
    )
    params = import_component_net(ref.state_dict())
    out = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b, with_bk=True)
    )(params, jnp.asarray(img1), jnp.asarray(img2))
    _compare_levels(out["flows_fw"], ref_out["flows_fw"], "flows_fw")
    _compare_levels(out["flows_bw"], ref_out["flows_bw"], "flows_bw")


def test_resnet_parity(rng):
    torch.manual_seed(0)
    ref = prob_ref.ResNet(prob_ref.ResidualBlock, [2, 2, 2, 2], in_channels=8,
                          num_classes=2)
    ref.eval()
    x = rng.rand(2, 64, 64, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_nchw(x)).numpy()

    model = ResNet(num_classes=2)
    params, stats = import_resnet(ref.state_dict(), prefix="")
    out = jax.jit(
        lambda v, a: model.apply(v, a, train=False)
    )({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-3)


def test_mixture_weights_net_runs(rng):
    """The reference MixtureWeightsNet crashes (uflow_prob_model.py:712
    unpacks 2 of 4 returns); ours must run and produce normalized weights."""
    model = PWCProbFlow(
        out_channels=(4, 4, 0),
        n_pyramids=1,
        mixture_weights=True,
        feature_norm=True,
        level_dropout=0.0,
    )
    img1 = jnp.asarray(rng.rand(1, 160, 160, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, 160, 160, 3).astype(np.float32))
    init_fn = jax.jit(lambda r: model.init(r, img1, img2, with_bk=True))
    variables = init_fn({"params": jax.random.PRNGKey(0)})
    out = jax.jit(
        lambda v, a, b: model.apply(v, a, b, with_bk=True)
    )(variables, img1, img2)
    w = np.asarray(out["weights_fw"])
    assert w.shape == (1, 2)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
