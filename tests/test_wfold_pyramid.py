"""W-folded feature pyramid: exact-relayout parity (ARFLOW_WFOLD_PYR).

The fold turns each thin 32-out pyramid conv into a fold-4 conv whose
kernel holds the original taps plus structural zeros
(models/layers.py wfold_s1_kernel / wfold_s2_kernel), so the computed sums
are the direct conv's sums up to MXU/XLA summation order. These tests pin:

  - per-level f32 parity of the folded PWCFeaturePyramid vs direct;
  - the mid-pyramid unfold fallback when a level's width stops dividing 8;
  - full-model parity (PWCFlow + PWCProbFlow) with the gate forced on/off;
  - kernel-gradient parity through the (linear) remap;
  - widths not divisible by 8 fall back to the direct path bitwise.

On TPU the measured end-to-end win is 2.4-3.1x on the pyramid
(benchmarks/bench_pyramid_fold_ab.py; BASELINE.md round 4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.models.uflow import PWCFeaturePyramid, PWCFlow


def _pyramid_outputs(x, wfold, monkeypatch):
    monkeypatch.setenv("ARFLOW_WFOLD_PYR", "1" if wfold else "0")
    pyr = PWCFeaturePyramid()
    variables = jax.jit(pyr.init)(jax.random.PRNGKey(0), x)
    return [
        np.asarray(f)
        for f in jax.jit(pyr.apply)(variables, x)
    ], variables


def test_wfold_pyramid_parity_f32(rng, monkeypatch):
    x = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    ref, _ = _pyramid_outputs(x, False, monkeypatch)
    got, _ = _pyramid_outputs(x, True, monkeypatch)
    # W=96: levels 0-2 fold (96, 48, 24 divisible by 8); level 3 input
    # W=12 triggers the mid-pyramid unfold fallback — parity must hold
    # across the transition.
    for lvl, (r, g) in enumerate(zip(ref, got)):
        assert r.shape == g.shape
        np.testing.assert_allclose(
            r, g, rtol=0, atol=2e-6, err_msg=f"level {lvl}"
        )


def test_wfold_pyramid_indivisible_width_is_direct(rng, monkeypatch):
    # W=100 % 8 != 0: the gate must fall back to the direct path bitwise.
    x = jnp.asarray(rng.rand(1, 64, 100, 3).astype(np.float32))
    ref, _ = _pyramid_outputs(x, False, monkeypatch)
    got, _ = _pyramid_outputs(x, True, monkeypatch)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_wfold_kernel_grads_match_direct(rng, monkeypatch):
    """The remap is linear in the kernel, so autodiff through the folded
    conv must produce the same parameter gradients as the direct conv."""
    x = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))

    grads = {}
    for wfold in (False, True):
        monkeypatch.setenv("ARFLOW_WFOLD_PYR", "1" if wfold else "0")
        pyr = PWCFeaturePyramid()
        variables = jax.jit(pyr.init)(jax.random.PRNGKey(0), x)

        def loss(p):
            feats = pyr.apply({"params": p}, x)
            return sum(jnp.sum(f**2) for f in feats)

        grads[wfold] = jax.jit(jax.grad(loss))(variables["params"])

    flat_ref = jax.tree_util.tree_leaves_with_path(grads[False])
    flat_got = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(grads[True])
    }
    for path, ref in flat_ref:
        got = flat_got[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), rtol=1e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_wfold_full_model_parity(rng, monkeypatch):
    x1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))

    outs = {}
    for wfold in (False, True):
        monkeypatch.setenv("ARFLOW_WFOLD_PYR", "1" if wfold else "0")
        monkeypatch.setenv("ARFLOW_HFOLD", "0")  # isolate the pyramid gate
        model = PWCFlow(level_dropout=0.0, feature_norm=True)
        variables = jax.jit(
            lambda r: model.init(r, x1, x2, with_bk=True)
        )(jax.random.PRNGKey(0))
        outs[wfold] = jax.jit(
            lambda v, a, b: model.apply(v, a, b, with_bk=True)
        )(variables, x1, x2)

    for key in ("flows_fw", "flows_bw"):
        for lvl, (r, g) in enumerate(zip(outs[False][key], outs[True][key])):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(g), rtol=0, atol=5e-5,
                err_msg=f"{key} level {lvl}",
            )


def test_wfold_prob_model_parity(rng, monkeypatch):
    from arflow_tpu.config import Config
    from arflow_tpu.models import get_model

    x1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    cfg = Config({
        "type": "uflow_prob", "feature_norm": True, "level_dropout": 0.0,
        "out_channels": [2, 2, 0], "inv_cov": False, "n_pyramids": 1,
        "mixture_weights": False,
    })

    outs = {}
    for wfold in (False, True):
        monkeypatch.setenv("ARFLOW_WFOLD_PYR", "1" if wfold else "0")
        monkeypatch.setenv("ARFLOW_HFOLD", "0")
        model = get_model(cfg)
        variables = jax.jit(
            lambda r: model.init(r, x1, x2, with_bk=False)
        )(jax.random.PRNGKey(0))
        outs[wfold] = jax.jit(
            lambda v, a, b: model.apply(v, a, b, with_bk=False)
        )(variables, x1, x2)

    ref, got = outs[False]["flows_fw"], outs[True]["flows_fw"]
    for lvl, (r, g) in enumerate(zip(ref[0], got[0])):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), rtol=0, atol=5e-5,
            err_msg=f"flows_fw level {lvl}",
        )


def test_wfold_training_default_off(rng, monkeypatch):
    """train=True must keep the DIRECT path (byte-identical trajectories
    with prior rounds) unless ARFLOW_WFOLD_PYR=1 forces it."""
    monkeypatch.delenv("ARFLOW_WFOLD_PYR", raising=False)
    x = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    pyr = PWCFeaturePyramid()
    variables = jax.jit(pyr.init)(jax.random.PRNGKey(0), x)
    train_feats = jax.jit(
        lambda v, a: pyr.apply(v, a, train=True)
    )(variables, x)
    monkeypatch.setenv("ARFLOW_WFOLD_PYR", "0")
    direct = jax.jit(lambda v, a: pyr.apply(v, a))(variables, x)
    for r, g in zip(train_feats, direct):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_wfold_pwclite_parity(rng, monkeypatch):
    """PWCLite folds only its thin (16/32-ch) pyramid levels; 64+-channel
    levels must unfold mid-pyramid and the model output must match.

    W=128: PWCLite's 6-level stride-2 pyramid needs W to survive six
    halvings plus the decoder's 2x re-upsampling (96 does not: 96 -> ... ->
    3 vs upflow2's 4)."""
    from arflow_tpu.models.pwclite import PWCLite

    x1 = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))

    outs = {}
    for wfold in (False, True):
        monkeypatch.setenv("ARFLOW_WFOLD_PYR", "1" if wfold else "0")
        model = PWCLite(n_frames=2)
        variables = jax.jit(
            lambda r: model.init(r, x1, x2, with_bk=True)
        )(jax.random.PRNGKey(0))
        outs[wfold] = jax.jit(
            lambda v, a, b: model.apply(v, a, b, with_bk=True)
        )(variables, x1, x2)

    for key in ("flows_fw", "flows_bw"):
        for lvl, (r, g) in enumerate(zip(outs[False][key], outs[True][key])):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(g), rtol=0, atol=5e-5,
                err_msg=f"{key} level {lvl}",
            )


def test_wfold_pwclite_uflow_parity(rng, monkeypatch):
    """ThinFeatureExtractor (all levels 16/32-ch) folds end-to-end."""
    from arflow_tpu.models.pwclite_uflow import PWCLiteUflow

    x1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))

    outs = {}
    for wfold in (False, True):
        monkeypatch.setenv("ARFLOW_WFOLD_PYR", "1" if wfold else "0")
        model = PWCLiteUflow(n_frames=2)
        variables = jax.jit(
            lambda r: model.init(r, x1, x2, with_bk=True)
        )(jax.random.PRNGKey(0))
        outs[wfold] = jax.jit(
            lambda v, a, b: model.apply(v, a, b, with_bk=True)
        )(variables, x1, x2)

    for key in ("flows_fw", "flows_bw"):
        for lvl, (r, g) in enumerate(zip(outs[False][key], outs[True][key])):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(g), rtol=0, atol=5e-5,
                err_msg=f"{key} level {lvl}",
            )
