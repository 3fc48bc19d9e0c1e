"""Mixed-precision (bf16 compute / f32 params) model path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.models import get_model


def test_uflow_bf16_matches_f32_closely(rng):
    cfg32 = Config({"type": "uflow", "feature_norm": True, "level_dropout": 0.0})
    cfg16 = Config(dict(cfg32, dtype="bfloat16"))
    m32 = get_model(cfg32)
    m16 = get_model(cfg16)

    i1 = jnp.asarray(rng.rand(1, 160, 160, 3).astype(np.float32))
    i2 = jnp.asarray(rng.rand(1, 160, 160, 3).astype(np.float32))
    variables = jax.jit(lambda r: m32.init(r, i1, i2, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    # Same f32 params drive both (params are dtype-independent).
    o32 = jax.jit(lambda v, a, b: m32.apply(v, a, b, with_bk=False))(
        variables, i1, i2
    )["flows_fw"][0]
    o16 = jax.jit(lambda v, a, b: m16.apply(v, a, b, with_bk=False))(
        variables, i1, i2
    )["flows_fw"][0]

    assert o16.dtype == jnp.float32  # outputs are cast back
    scale = float(jnp.mean(jnp.abs(o32))) + 1e-6
    rel = float(jnp.mean(jnp.abs(o32 - o16))) / scale
    assert rel < 0.05, f"bf16 deviates too much: {rel}"


def test_pwclite_bf16_matches_f32_closely(rng):
    cfg32 = Config({"type": "pwclite", "n_frames": 2, "upsample": True,
                    "reduce_dense": True})
    cfg16 = Config(dict(cfg32, dtype="bfloat16"))
    m32 = get_model(cfg32)
    m16 = get_model(cfg16)

    i1 = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    i2 = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    variables = jax.jit(lambda r: m32.init(r, i1, i2, with_bk=True))(
        jax.random.PRNGKey(0)
    )
    o32 = jax.jit(lambda v, a, b: m32.apply(v, a, b, with_bk=True))(
        variables, i1, i2
    )
    o16 = jax.jit(lambda v, a, b: m16.apply(v, a, b, with_bk=True))(
        variables, i1, i2
    )

    for key in ("flows_fw", "flows_bw"):
        assert o16[key][0].dtype == jnp.float32  # outputs are cast back
        scale = float(jnp.mean(jnp.abs(o32[key][0]))) + 1e-6
        rel = float(jnp.mean(jnp.abs(o32[key][0] - o16[key][0]))) / scale
        assert rel < 0.05, f"bf16 {key} deviates too much: {rel}"
@pytest.mark.slow
def test_pwclite_prob_and_uflow_bf16(rng):
    for base in (
        {"type": "pwclite_prob", "n_frames": 2, "upsample": True,
         "reduce_dense": True},
        {"type": "pwclite_uflow", "n_frames": 2, "reduce_dense": True,
         "feature_norm": True, "align_corners": True, "warp_pad": "border",
         "level_dropout": 0.0},
    ):
        m32 = get_model(Config(dict(base)))
        m16 = get_model(Config(dict(base, dtype="bfloat16")))
        i1 = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        i2 = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        variables = jax.jit(lambda r: m32.init(r, i1, i2, with_bk=True))(
            jax.random.PRNGKey(0)
        )
        o32 = jax.jit(lambda v, a, b: m32.apply(v, a, b, with_bk=True))(
            variables, i1, i2
        )["flows_fw"][0]
        o16 = jax.jit(lambda v, a, b: m16.apply(v, a, b, with_bk=True))(
            variables, i1, i2
        )["flows_fw"][0]
        assert o16.dtype == jnp.float32, base["type"]
        scale = float(jnp.mean(jnp.abs(o32))) + 1e-6
        rel = float(jnp.mean(jnp.abs(o32 - o16))) / scale
        assert rel < 0.06, f"{base['type']} bf16 deviates: {rel}"
