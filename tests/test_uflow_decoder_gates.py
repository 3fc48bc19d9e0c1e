"""Split-kernel decoder and 2B-batched pyramid == the materialized baseline.

`ARFLOW_SPLIT_DECODER` (arflow_tpu/models/layers.py SplitConv) picks at
trace time whether each dense-net decoder conv consumes the growing
channel concat directly or as a sum of per-chunk convs over kernel
slices; `ARFLOW_PYR_BATCH` (arflow_tpu/models/bidir.py) picks whether the
feature pyramid runs once at 2B on [img1; img2] or twice at B. Both are
algebraic identities (conv over a concat == sum of convs over the
slices; convs never mix batch entries — reference uflow_model.py:196-208,
:288-323), so all gate combinations must agree, and the parameter tree
must be byte-identical so checkpoints/torch imports are layout-stable.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.models import get_model

B, H, W = 2, 64, 64


@pytest.fixture
def imgs(rng):
    return [
        jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        for _ in range(2)
    ]


def _uflow_model():
    return get_model(Config({"type": "uflow", "feature_norm": True,
                             "level_dropout": 0.0}))


def _run(monkeypatch, model, split, pyr, imgs, with_bk=True):
    monkeypatch.setenv("ARFLOW_SPLIT_DECODER", split)
    monkeypatch.setenv("ARFLOW_PYR_BATCH", pyr)
    variables = jax.jit(
        lambda r, *im: model.init(r, *im, with_bk=with_bk)
    )(jax.random.PRNGKey(0), *imgs)
    out = jax.jit(
        lambda v, *im: model.apply(v, *im, with_bk=with_bk)
    )(variables, *imgs)
    return jax.tree_util.tree_map(np.asarray, out), variables


def _assert_same(a, b, atol=1e-4, rtol=1e-4):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb) and len(la) > 0
    for x, y in zip(la, lb):
        np.testing.assert_allclose(x, y, atol=atol, rtol=rtol)
@pytest.mark.slow
def test_decoder_gate_equivalence(monkeypatch, imgs):
    model = _uflow_model()
    ref, vref = _run(monkeypatch, model, "0", "0", imgs)
    for split, pyr in itertools.product(("0", "1"), ("0", "1")):
        if (split, pyr) == ("0", "0"):
            continue
        got, v = _run(monkeypatch, model, split, pyr, imgs)
        _assert_same(ref, got)
        # Identical param tree structure AND identical init values.
        assert (jax.tree_util.tree_structure(vref)
                == jax.tree_util.tree_structure(v))
        _assert_same(vref, v, atol=0)
@pytest.mark.slow
def test_decoder_gate_equivalence_grad(monkeypatch, imgs):
    """Gradients agree too (the split path sums f32 partials; the VJP
    slices the cotangent back per chunk)."""
    model = _uflow_model()

    def loss_fn(v, im1, im2):
        out = model.apply(v, im1, im2, with_bk=False)
        # Smooth loss: |.| has a kink that turns f32 partial-sum
        # reassociation in the forward pass into spurious grad flips.
        return sum(0.5 * jnp.sum(jnp.square(f)) for f in out["flows_fw"])

    grads = {}
    for split in ("0", "1"):
        monkeypatch.setenv("ARFLOW_SPLIT_DECODER", split)
        monkeypatch.setenv("ARFLOW_PYR_BATCH", "0")
        v = jax.jit(
            lambda r, *im: model.init(r, *im, with_bk=False)
        )(jax.random.PRNGKey(0), *imgs)
        grads[split] = jax.tree_util.tree_map(
            np.asarray, jax.jit(jax.grad(loss_fn))(v, *imgs)
        )
    _assert_same(grads["0"], grads["1"], atol=3e-3, rtol=1e-2)
