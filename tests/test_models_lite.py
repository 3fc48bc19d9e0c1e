"""Parity tests for the PWC-Lite model family vs the reference torch models."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import import_reference
from arflow_tpu.config import Config
from arflow_tpu.models.pwclite import PWCLite
from arflow_tpu.models.pwclite_prob import PWCLiteProb
from arflow_tpu.models.pwclite_uflow import PWCLiteUflow
from arflow_tpu.models.torch_import import import_pwclite, import_pwclite_uflow

pwclite_ref = import_reference("models.pwclite")
pwclite_prob_ref = import_reference("models.pwclite_prob")
pwclite_uflow_ref = import_reference("models.pwclite_uflow")

B, H, W = 1, 128, 128


def _imgs(rng, n):
    return [rng.rand(B, H, W, 3).astype(np.float32) for _ in range(n)]


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _compare_levels(ours, theirs, key, atol=3e-4):
    assert len(ours) == len(theirs), key
    for lvl, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(
            np.asarray(o), _nhwc(t), atol=atol, rtol=1e-3,
            err_msg=f"{key} level {lvl}",
        )


@pytest.mark.slow
@pytest.mark.parametrize("reduce_dense", [True, False])
def test_pwclite_2frame_parity(rng, reduce_dense):
    torch.manual_seed(0)
    cfg = Config({"n_frames": 2, "upsample": True, "reduce_dense": reduce_dense})
    ref = pwclite_ref.PWCLite(cfg)
    ref.eval()
    imgs = _imgs(rng, 2)
    with torch.no_grad():
        ref_out = ref(torch.cat([_nchw(i) for i in imgs], dim=1), with_bk=True)

    model = PWCLite(n_frames=2, upsample=True, reduce_dense=reduce_dense)
    params = import_pwclite(ref.state_dict(), reduce_dense=reduce_dense)
    out = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b, with_bk=True)
    )(params, jnp.asarray(imgs[0]), jnp.asarray(imgs[1]))

    _compare_levels(out["flows_fw"], ref_out["flows_fw"], "flows_fw")
    _compare_levels(out["flows_bw"], ref_out["flows_bw"], "flows_bw")


@pytest.mark.slow
def test_pwclite_3frame_parity(rng):
    torch.manual_seed(0)
    cfg = Config({"n_frames": 3, "upsample": True, "reduce_dense": True})
    ref = pwclite_ref.PWCLite(cfg)
    ref.eval()
    imgs = _imgs(rng, 3)
    with torch.no_grad():
        ref_out = ref(torch.cat([_nchw(i) for i in imgs], dim=1), with_bk=True)

    model = PWCLite(n_frames=3, upsample=True, reduce_dense=True)
    params = import_pwclite(ref.state_dict())
    out = jax.jit(
        lambda p, a, b, c: model.apply({"params": p}, a, b, c, with_bk=True)
    )(params, *(jnp.asarray(i) for i in imgs))

    _compare_levels(out["flows_fw"], ref_out["flows_fw"], "flows_fw")
    _compare_levels(out["flows_bw"], ref_out["flows_bw"], "flows_bw")


@pytest.mark.slow
def test_pwclite_prob_parity(rng):
    torch.manual_seed(0)
    cfg = Config({"n_frames": 2, "upsample": True, "reduce_dense": True})
    ref = pwclite_prob_ref.PWCLiteProb(cfg)
    ref.eval()
    imgs = _imgs(rng, 2)
    with torch.no_grad():
        ref_out = ref(torch.cat([_nchw(i) for i in imgs], dim=1), with_bk=False)

    model = PWCLiteProb(n_frames=2, upsample=True, reduce_dense=True)
    params = import_pwclite(ref.state_dict())
    out = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b, with_bk=False)
    )(params, jnp.asarray(imgs[0]), jnp.asarray(imgs[1]))

    _compare_levels(out["flows_fw"], ref_out["flows_fw"], "flows_fw")


@pytest.mark.slow
@pytest.mark.parametrize("align_corners,warp_pad", [(True, "zeros"), (False, "border")])
def test_pwclite_uflow_parity(rng, align_corners, warp_pad):
    torch.manual_seed(0)
    cfg = Config(
        {
            "n_frames": 2,
            "reduce_dense": True,
            "level_dropout": 0.0,
            "feature_norm": True,
            "align_corners": align_corners,
            "warp_pad": warp_pad,
        }
    )
    ref = pwclite_uflow_ref.PWCLiteUflow(cfg)
    ref.eval()
    imgs = _imgs(rng, 2)
    with torch.no_grad():
        ref_out = ref(torch.cat([_nchw(i) for i in imgs], dim=1), with_bk=False)

    model = PWCLiteUflow(
        n_frames=2,
        reduce_dense=True,
        level_dropout=0.0,
        feature_norm=True,
        align_corners=align_corners,
        warp_pad=warp_pad,
    )
    params = import_pwclite_uflow(ref.state_dict())
    out = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b, with_bk=False)
    )(params, jnp.asarray(imgs[0]), jnp.asarray(imgs[1]))

    _compare_levels(out["flows_fw"], ref_out["flows_fw"], "flows_fw")
