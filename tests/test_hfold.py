"""H-fold decoder relayout: exact-numerics equivalence vs the unfolded path.

``ARFLOW_HFOLD=<target>`` folds H-slices into the batch axis for the
dense-net decoder stacks (arflow_tpu/models/uflow.py) because XLA's TPU conv
emitter runs the same-FLOP stack ~2.5x faster at batch>=8 than at b<=4
(benchmarks/bench_decoder_shape_probe.py). The fold must be EXACT: every
conv gets one row of true neighbor data per slice edge (zeros at the real
image top/bottom) and runs H-valid, so each output element sees the
identical receptive field as the full-H SAME conv. These tests pin forward
outputs and parameter gradients, folded vs unfolded, at strict float32
tolerances, including degenerate folds (1-row slices at the coarsest level)
and the batched-bidirectional forward.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.models.uflow import PWCFlow


def _forward(params, img1, img2, with_bk, hfold):
    """Trace-time env gate -> fresh trace per mode."""
    os.environ["ARFLOW_HFOLD"] = str(hfold)
    try:
        model = PWCFlow(level_dropout=0.0, feature_norm=True)

        @jax.jit
        def run(p, a, b):
            return model.apply({"params": p}, a, b, with_bk=with_bk)

        return jax.device_get(run(params, img1, img2))
    finally:
        os.environ.pop("ARFLOW_HFOLD", None)


def _grads(params, img1, img2, hfold):
    os.environ["ARFLOW_HFOLD"] = str(hfold)
    try:
        model = PWCFlow(level_dropout=0.0, feature_norm=True)

        @jax.jit
        def g(p, a, b):
            def loss(pp):
                res = model.apply({"params": pp}, a, b, with_bk=False)
                # Touch every decoder level so every folded conv gets a
                # nontrivial cotangent.
                return sum(jnp.sum(jnp.abs(f)) for f in res["flows_fw"])

            return jax.grad(loss)(p)

        return jax.device_get(g(params, img1, img2))
    finally:
        os.environ.pop("ARFLOW_HFOLD", None)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(7)
    b, h, w = 2, 96, 128  # coarsest level h0=3: exercises 1-row slices
    img1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img1, img2)["params"]
    return params, img1, img2


def test_hfold_forward_exact(setup):
    params, img1, img2 = setup
    base = _forward(params, img1, img2, True, 0)
    fold = _forward(params, img1, img2, True, 8)
    for key in ("flows_fw", "flows_bw"):
        for lvl, (a, b) in enumerate(zip(base[key], fold[key])):
            np.testing.assert_allclose(
                a, b, rtol=1e-6, atol=1e-5,
                err_msg=f"{key} level {lvl} folded != unfolded",
            )


def test_hfold_forward_exact_b1(setup):
    """Streaming batch=1 takes the largest fold factor (k=8 where H allows,
    clamped to a divisor at coarse levels)."""
    params, img1, img2 = setup
    base = _forward(params, img1[:1], img2[:1], False, 0)
    fold = _forward(params, img1[:1], img2[:1], False, 8)
    for lvl, (a, b) in enumerate(zip(base["flows_fw"], fold["flows_fw"])):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5,
                                   err_msg=f"level {lvl}")


def test_hfold_prob_forward_exact(setup):
    """PWCProbFlow's decoder takes the same fold (models/uflow_prob.py),
    including the grouped-output final conv (out_channels [L, M, N])."""
    from arflow_tpu.models.uflow_prob import PWCProbFlow

    _, img1, img2 = setup
    model = PWCProbFlow(level_dropout=0.0, feature_norm=True,
                        out_channels=(2, 2, 6), inv_cov=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), img1, img2)["params"]

    def run(hfold, imgs):
        os.environ["ARFLOW_HFOLD"] = str(hfold)
        try:
            @jax.jit
            def f(p, a, b):
                return model.apply({"params": p}, a, b, with_bk=False)

            return jax.device_get(f(params, *imgs))
        finally:
            os.environ.pop("ARFLOW_HFOLD", None)

    for imgs in ((img1, img2), (img1[:1], img2[:1])):
        base, fold = run(0, imgs), run(8, imgs)
        for lvl, (a, b) in enumerate(zip(base["flows_fw"], fold["flows_fw"])):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5,
                                       err_msg=f"prob level {lvl} b{imgs[0].shape[0]}")


def _refine_env(refine):
    os.environ["ARFLOW_HFOLD"] = "0"  # isolate: decoder fold off
    if refine:
        os.environ["ARFLOW_HFOLD_REFINE"] = "8"
    else:
        os.environ.pop("ARFLOW_HFOLD_REFINE", None)


def test_hfold_refine_forward_exact():
    """Round-5: the dilated refinement stack folds too (per-conv halo =
    dilation rows, fold capped so slice height >= max dilation 16).
    H=128 -> output-level h=32 -> k=2 slices of 16 rows."""
    rng = np.random.RandomState(11)
    img1 = jnp.asarray(rng.rand(1, 128, 96, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, 128, 96, 3).astype(np.float32))
    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), img1, img2)["params"]

    outs = {}
    for refine in (False, True):
        _refine_env(refine)
        try:
            @jax.jit
            def f(p, a, b):
                return model.apply({"params": p}, a, b, with_bk=False)

            outs[refine] = jax.device_get(f(params, img1, img2))
        finally:
            os.environ.pop("ARFLOW_HFOLD", None)
            os.environ.pop("ARFLOW_HFOLD_REFINE", None)
    for lvl, (a, b) in enumerate(
        zip(outs[False]["flows_fw"], outs[True]["flows_fw"])
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5,
                                   err_msg=f"refine-fold level {lvl}")


def test_hfold_refine_grads_exact():
    rng = np.random.RandomState(12)
    img1 = jnp.asarray(rng.rand(1, 128, 96, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, 128, 96, 3).astype(np.float32))
    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(3), img1, img2)["params"]

    grads = {}
    for refine in (False, True):
        _refine_env(refine)
        try:
            @jax.jit
            def g(p, a, b):
                def loss(pp):
                    res = model.apply({"params": pp}, a, b, with_bk=False)
                    return sum(jnp.sum(jnp.abs(f)) for f in res["flows_fw"])

                return jax.grad(loss)(p)

            grads[refine] = jax.device_get(g(params, img1, img2))
        finally:
            os.environ.pop("ARFLOW_HFOLD", None)
            os.environ.pop("ARFLOW_HFOLD_REFINE", None)
    flat0 = jax.tree_util.tree_leaves_with_path(grads[False])
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(grads[True])}
    for path, leaf in flat0:
        key = jax.tree_util.keystr(path)
        scale = max(1.0, float(np.max(np.abs(leaf))))
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat1[key]),
            rtol=1e-5, atol=1e-5 * scale,
            err_msg=f"refine-fold grad mismatch at {key}",
        )


def test_hfold_refine_prob_forward_exact():
    """PWCProbFlow's refinement stack takes the same dilated fold."""
    from arflow_tpu.models.uflow_prob import PWCProbFlow

    rng = np.random.RandomState(13)
    img1 = jnp.asarray(rng.rand(1, 128, 96, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, 128, 96, 3).astype(np.float32))
    model = PWCProbFlow(level_dropout=0.0, feature_norm=True,
                        out_channels=(2, 2, 6), inv_cov=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), img1, img2)["params"]

    outs = {}
    for refine in (False, True):
        _refine_env(refine)
        try:
            @jax.jit
            def f(p, a, b):
                return model.apply({"params": p}, a, b, with_bk=False)

            outs[refine] = jax.device_get(f(params, img1, img2))
        finally:
            os.environ.pop("ARFLOW_HFOLD", None)
            os.environ.pop("ARFLOW_HFOLD_REFINE", None)
    for lvl, (a, b) in enumerate(
        zip(outs[False]["flows_fw"], outs[True]["flows_fw"])
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5,
                                   err_msg=f"prob refine-fold level {lvl}")


def test_hfold_grads_exact(setup):
    params, img1, img2 = setup
    g0 = _grads(params, img1, img2, 0)
    g8 = _grads(params, img1, img2, 8)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat8 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g8)}
    for path, leaf in flat0:
        key = jax.tree_util.keystr(path)
        scale = max(1.0, float(np.max(np.abs(leaf))))
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat8[key]),
            rtol=1e-5, atol=1e-5 * scale,
            err_msg=f"grad mismatch at {key}",
        )
