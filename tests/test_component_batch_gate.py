"""Batched mixture components == sequential per-pyramid passes.

`ARFLOW_COMPONENT_BATCH` (arflow_tpu/models/bidir.py) picks at trace time
whether the K mixture components of PWCProbFlow (n_pyramids > 1) ride one
shared-weight decoder pass at K*B (2K*B with bidir batching) or K
sequential passes. The decoder weights are shared across components
(reference uflow_prob_model.py:187,391-404) and every decoder op is
per-sample, so both modes must produce the same flows.
"""

import itertools

import numpy as np
import pytest

import jax

from arflow_tpu.config import Config
from arflow_tpu.models import get_model

B, H, W = 2, 64, 64


def _run(monkeypatch, model, comp_mode, bidir_mode, imgs, with_bk=True):
    monkeypatch.setenv("ARFLOW_COMPONENT_BATCH", comp_mode)
    monkeypatch.setenv("ARFLOW_BIDIR_BATCH", bidir_mode)
    variables = jax.jit(
        lambda r, *im: model.init(r, *im, with_bk=with_bk)
    )(jax.random.PRNGKey(0), *imgs)
    out = jax.jit(
        lambda v, *im: model.apply(v, *im, with_bk=with_bk)
    )(variables, *imgs)
    return jax.tree_util.tree_map(np.asarray, out)


def _assert_same(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb) and len(la) > 0
    for x, y in zip(la, lb):
        np.testing.assert_allclose(x, y, atol=1e-4, rtol=1e-4)


@pytest.fixture
def imgs(rng):
    return [
        jax.numpy.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        for _ in range(2)
    ]
@pytest.mark.slow
def test_component_batch_equivalence_k2(monkeypatch, imgs):
    model = get_model(Config({
        "type": "uflow_prob", "out_channels": [2, 2, 0], "inv_cov": False,
        "n_pyramids": 2, "mixture_weights": False, "feature_norm": True,
        "level_dropout": 0.0,
    }))
    # Reference semantics = sequential pyramids + sequential directions.
    ref = _run(monkeypatch, model, "0", "0", imgs)
    for comp, bidir in itertools.product(("0", "1"), ("0", "1")):
        if (comp, bidir) == ("0", "0"):
            continue
        got = _run(monkeypatch, model, comp, bidir, imgs)
        _assert_same(ref, got)


def test_component_batch_equivalence_k3_fw_only(monkeypatch, imgs):
    model = get_model(Config({
        "type": "uflow_prob", "out_channels": [2, 2, 0], "inv_cov": False,
        "n_pyramids": 3, "mixture_weights": False, "feature_norm": True,
        "level_dropout": 0.0,
    }))
    ref = _run(monkeypatch, model, "0", "0", imgs, with_bk=False)
    got = _run(monkeypatch, model, "1", "0", imgs, with_bk=False)
    _assert_same(ref, got)
    assert "flows_bw" not in got


def test_component_batch_param_tree_unchanged(monkeypatch, imgs):
    """Both modes init the identical parameter structure (checkpoints and
    torch imports are layout-stable)."""
    model = get_model(Config({
        "type": "uflow_prob", "out_channels": [2, 2, 0], "inv_cov": False,
        "n_pyramids": 2, "mixture_weights": False, "feature_norm": True,
        "level_dropout": 0.0,
    }))
    trees = []
    for comp in ("0", "1"):
        monkeypatch.setenv("ARFLOW_COMPONENT_BATCH", comp)
        v = jax.jit(
            lambda r, *im: model.init(r, *im, with_bk=True)
        )(jax.random.PRNGKey(0), *imgs)
        trees.append(jax.tree_util.tree_structure(v))
    assert trees[0] == trees[1]
