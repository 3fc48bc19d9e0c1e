"""int8 quantized pyramid convs (ARFLOW_INT8_PYRAMID, serving-only).

Dynamic symmetric quantization: per-SAMPLE activation scales, per-OUTPUT-
CHANNEL weight scales, int32 accumulation, f32 dequant
(arflow_tpu/models/layers.py quantized_conv2d). Measured 1.58-1.88x over
bf16 at the pyramid's conv shapes on TPU v5e
(benchmarks/bench_int8_conv_probe.py); this file pins the numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.models.layers import Conv2dNPad, quantized_conv2d


def _f32_conv(x, kernel, bias, stride=1, pad=1):
    from jax import lax

    y = lax.conv_general_dilated(
        x, kernel, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


def test_exact_on_quantization_grid(rng):
    """Inputs/weights already on the int8 grid quantize losslessly, so the
    int8 conv must equal the f32 conv to float tolerance."""
    xi = rng.randint(-127, 128, (2, 12, 16, 8)).astype(np.float32)
    xi[:, 0, 0, 0] = 127.0  # pin the per-sample max to full scale
    ki = rng.randint(-127, 128, (3, 3, 8, 16)).astype(np.float32)
    ki[0, 0, 0, :] = 127.0  # pin each output channel's max to full scale
    x = jnp.asarray(xi / 127.0 * 0.5)
    kernel = jnp.asarray(ki / 127.0 * 0.03)
    bias = jnp.asarray(rng.rand(16).astype(np.float32))
    yq = quantized_conv2d(x, kernel, bias, stride=1, pad=1)
    yf = _f32_conv(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(yq), np.asarray(yf),
                               rtol=1e-5, atol=1e-5)


def test_error_bound_random(rng):
    """On arbitrary data the quantization error stays within the analytic
    half-step bound: |dy| <= sum_k |contrib err| ~ (ax/2)*sum|w| +
    (sw/2)*sum|x| per output. Check a safely loose empirical bound."""
    x = jnp.asarray(rng.rand(2, 20, 24, 8).astype(np.float32) * 2 - 1)
    kernel = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    bias = jnp.zeros((16,), jnp.float32)
    yq = np.asarray(quantized_conv2d(x, kernel, bias, stride=1, pad=1))
    yf = np.asarray(_f32_conv(x, kernel, bias))
    scale = np.abs(yf).max()
    assert np.abs(yq - yf).max() <= 0.02 * scale
    # and it is genuinely close on average
    assert np.abs(yq - yf).mean() <= 0.002 * scale


def test_per_sample_scales_batch_independent(rng):
    """Per-sample activation scales: a sample's result must not change when
    it is batched next to a large-magnitude outlier sample (b1 streaming
    numerics == batched serving numerics)."""
    x1 = rng.rand(1, 12, 16, 8).astype(np.float32)
    x_out = 50.0 * rng.rand(1, 12, 16, 8).astype(np.float32)
    kernel = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.rand(16).astype(np.float32))
    y_solo = quantized_conv2d(jnp.asarray(x1), kernel, bias, stride=1, pad=1)
    y_batched = quantized_conv2d(
        jnp.asarray(np.concatenate([x1, x_out], 0)), kernel, bias,
        stride=1, pad=1,
    )
    np.testing.assert_array_equal(np.asarray(y_solo)[0],
                                  np.asarray(y_batched)[0])


def test_conv2dnpad_gate_dispatch(rng, monkeypatch):
    """The ARFLOW_INT8_PYRAMID gate swaps Conv2dNPad's apply path at trace
    time with the SAME param tree; values agree to quantization noise."""
    x = jnp.asarray(rng.rand(2, 16, 24, 8).astype(np.float32))
    mod = Conv2dNPad(16, kernel_size=3, stride=2, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("ARFLOW_INT8_PYRAMID", "0")
    y_off = np.asarray(mod.apply(v, x).astype(jnp.float32))
    monkeypatch.setenv("ARFLOW_INT8_PYRAMID", "1")
    y_on = np.asarray(mod.apply(v, x).astype(jnp.float32))
    assert y_on.shape == y_off.shape
    scale = np.abs(y_off).max()
    assert np.abs(y_on - y_off).max() <= 0.03 * scale


def test_dtype_int8_config(monkeypatch):
    """model.dtype 'int8' = bf16 compute + a PER-INSTANCE int8_pyramid
    attribute — never process state: no env mutation, and other models
    built afterwards in the same process are unaffected."""
    import os

    from arflow_tpu.config import Config
    from arflow_tpu.models import get_model

    monkeypatch.delenv("ARFLOW_INT8_PYRAMID", raising=False)
    m = get_model(Config({"type": "uflow", "dtype": "int8"}))
    assert m.dtype == jnp.bfloat16 and m.int8_pyramid
    assert "ARFLOW_INT8_PYRAMID" not in os.environ  # no process leak
    m2 = get_model(Config({"type": "uflow", "dtype": "bfloat16"}))
    assert not m2.int8_pyramid
    prob = get_model(Config({"type": "uflow_prob", "dtype": "int8",
                             "out_channels": [2, 2, 0]}))
    assert prob.int8_pyramid
    with pytest.raises(NotImplementedError, match="no int8 path"):
        get_model(Config({"type": "pwclite", "n_frames": 2,
                          "dtype": "int8"}))
@pytest.mark.slow
def test_int8_attribute_is_per_instance(rng, monkeypatch):
    """An int8 model and an exact model coexist in one process: the exact
    one stays bit-identical to a process that never built an int8 model."""
    from arflow_tpu.models.uflow import PWCFlow

    monkeypatch.delenv("ARFLOW_INT8_PYRAMID", raising=False)
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    exact = PWCFlow()
    v = jax.jit(lambda r: exact.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    baseline = np.asarray(
        exact.apply(v, img1, img2, with_bk=False)["flows_fw"][0]
    )
    quant = PWCFlow(int8_pyramid=True)
    _ = quant.apply(v, img1, img2, with_bk=False)  # traces the int8 path
    again = np.asarray(
        exact.apply(v, img1, img2, with_bk=False)["flows_fw"][0]
    )
    np.testing.assert_array_equal(baseline, again)


def _train_cfg(tmp_path, model):
    from arflow_tpu.config import Config

    return Config({
        "model": model,
        "loss": {"type": "uflow"}, "trainer": "uflow", "seed": 0,
        "data": [], "save_root": str(tmp_path),
        "train": {"epoch_size": 1, "valid_size": 0, "batch_size": 1},
    })


def test_train_rejects_int8(tmp_path, monkeypatch):
    from arflow_tpu.cli import train_main

    with pytest.raises(ValueError, match="serving-only"):
        train_main(_train_cfg(tmp_path, {"type": "uflow", "dtype": "int8"}),
                   None)
    # the env force-override form is rejected too (zero-gradient pyramid)
    monkeypatch.setenv("ARFLOW_INT8_PYRAMID", "1")
    with pytest.raises(ValueError, match="serving-only"):
        train_main(_train_cfg(tmp_path, {"type": "uflow"}), None)


def test_uflow_forward_int8_pyramid(rng, monkeypatch):
    """Model-level: the uflow forward runs end-to-end with the int8 pyramid
    and the flow fields stay finite and close to the exact forward (random
    init; the EPE impact on trained weights is measured on TPU by
    benchmarks/bench_int8_serving.py)."""
    from arflow_tpu.models.uflow import PWCFlow

    img1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    model = PWCFlow(dtype=jnp.bfloat16)
    v = jax.jit(lambda r: model.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0)
    )

    monkeypatch.setenv("ARFLOW_INT8_PYRAMID", "0")
    f_off = np.asarray(
        jax.jit(lambda p: model.apply(p, img1, img2, with_bk=False)[
            "flows_fw"][0])(v)
    )
    monkeypatch.setenv("ARFLOW_INT8_PYRAMID", "1")
    f_on = np.asarray(
        jax.jit(lambda p: model.apply(p, img1, img2, with_bk=False)[
            "flows_fw"][0])(v)
    )
    assert np.isfinite(f_on).all()
    # Random init at a tiny 64x96 resolution is the WORST case for feature
    # perturbations (near-degenerate cost volumes, 4 accumulate+upsample
    # levels compound them) — this is a sanity bound, not the accuracy
    # claim; the EPE impact on TRAINED weights is measured on TPU by
    # benchmarks/bench_int8_serving.py.
    assert np.abs(f_on - f_off).max() < 1.0
    assert np.abs(f_on - f_off).mean() < 0.1
