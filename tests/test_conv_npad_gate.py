"""Conv2dNPad: the bf16 thin-N pad-to-64 gate is numerically exact.

The gate (ARFLOW_CONV_NPAD) zero-pads kernel output channels to 64 on the
MXU and slices the result — measured a wash on TPU (BASELINE.md MFU
ceiling analysis) and kept as a recorded experiment. Param layout must
stay identical to conv2d's nn.Conv (checkpoint/torch-import stability).
"""

import numpy as np

import jax
import jax.numpy as jnp

from arflow_tpu.models.layers import Conv2dNPad, conv2d


def test_gate_matches_plain_conv_bf16(rng, monkeypatch):
    x = jnp.asarray(rng.rand(2, 16, 24, 32).astype(np.float32))
    mod = Conv2dNPad(32, kernel_size=3, stride=1, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("ARFLOW_CONV_NPAD", "0")
    y_off = mod.apply(v, x)
    monkeypatch.setenv("ARFLOW_CONV_NPAD", "1")
    y_on = mod.apply(v, x)
    np.testing.assert_array_equal(
        np.asarray(y_off.astype(jnp.float32)),
        np.asarray(y_on.astype(jnp.float32)),
    )


def test_param_layout_and_f32_match_conv2d(rng, monkeypatch):
    monkeypatch.setenv("ARFLOW_CONV_NPAD", "1")  # f32 must ignore the gate
    x = jnp.asarray(rng.rand(2, 16, 24, 8).astype(np.float32))
    for stride in (1, 2):
        mod = Conv2dNPad(16, kernel_size=3, stride=stride)
        ref = conv2d(16, kernel_size=3, stride=stride)
        v = mod.init(jax.random.PRNGKey(0), x)
        vr = ref.init(jax.random.PRNGKey(0), x)
        assert v["params"]["kernel"].shape == vr["params"]["kernel"].shape
        assert v["params"]["bias"].shape == vr["params"]["bias"].shape
        y = mod.apply(vr, x)  # identical param tree applies directly
        yr = ref.apply(vr, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(yr), atol=1e-6
        )
