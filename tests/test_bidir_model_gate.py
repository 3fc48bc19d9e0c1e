"""Batched-bidirectional model forward == sequential, for every family.

`ARFLOW_BIDIR_BATCH` (arflow_tpu/models/bidir.py) picks at trace time
whether fw+bw ride one 2B-batch coarse-to-fine pass or two sequential
B-batch passes. Both must produce the same per-sample flows — convs,
cost volumes and warps never mix batch entries. Each mode gets its own
freshly-created jit so the env gate is re-read.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.models import get_model

B, H, W = 2, 64, 64


def _run(monkeypatch, model, mode, *imgs):
    monkeypatch.setenv("ARFLOW_BIDIR_BATCH", mode)
    variables = jax.jit(
        lambda r, *im: model.init(r, *im, with_bk=True)
    )(jax.random.PRNGKey(0), *imgs)
    out = jax.jit(
        lambda v, *im: model.apply(v, *im, with_bk=True)
    )(variables, *imgs)
    return jax.tree_util.tree_map(np.asarray, out)


def _assert_same(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb) and len(la) > 0
    for x, y in zip(la, lb):
        # 2B-batch vs B-batch convs tile differently -> ~1e-5 float
        # reassociation noise; anything structural would be >> this.
        np.testing.assert_allclose(x, y, atol=1e-4, rtol=1e-4)


MODEL_CFGS = [
    ({"type": "pwclite", "n_frames": 2, "upsample": True,
      "reduce_dense": True}, 2),
    pytest.param(
        {"type": "pwclite", "n_frames": 5, "upsample": True,
         "reduce_dense": True}, 5, marks=pytest.mark.slow),
    ({"type": "pwclite_prob", "n_frames": 2, "upsample": True,
      "reduce_dense": True}, 2),
    ({"type": "pwclite_uflow", "n_frames": 2, "upsample": True,
      "reduce_dense": True, "feature_norm": True, "align_corners": True,
      "warp_pad": "border", "level_dropout": 0.0}, 2),
    ({"type": "uflow", "feature_norm": True, "level_dropout": 0.0}, 2),
    ({"type": "uflow_prob", "out_channels": [2, 2, 4], "inv_cov": False,
      "n_pyramids": 1, "mixture_weights": False, "feature_norm": True,
      "level_dropout": 0.0}, 2),
]


def _cfg_id(entry):
    c, n = entry.values if hasattr(entry, "values") else entry
    return c["type"] + (f"_{n}f" if n != 2 else "")


@pytest.mark.parametrize(
    "cfg,n_imgs", MODEL_CFGS, ids=[_cfg_id(e) for e in MODEL_CFGS],
)
def test_bidir_gate_modes_agree(rng, monkeypatch, cfg, n_imgs):
    model = get_model(Config(dict(cfg)))
    imgs = [
        jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        for _ in range(n_imgs)
    ]
    out_batched = _run(monkeypatch, model, "1", *imgs)
    out_seq = _run(monkeypatch, model, "0", *imgs)
    assert set(out_batched) == set(out_seq) == {"flows_fw", "flows_bw"}
    _assert_same(out_batched, out_seq)
