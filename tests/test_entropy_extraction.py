"""Per-approximation uncertainty-map extraction (training/entropy.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.training.entropy import extract_uv_entropy

B, H2, W2 = 2, 8, 12
H, W = H2 * 4, W2 * 4


def make_flows(rng, ch0, ch2):
    f0 = jnp.asarray(rng.randn(B, H, W, ch0).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H2, W2, ch2).astype(np.float32))
    dummy = jnp.zeros((B, 2, 2, 2), jnp.float32)
    return [f0, dummy, f2, dummy, dummy, dummy]


def test_diag(rng):
    flows = make_flows(rng, 4, 4)
    cfg = Config({"approx": "diag"})
    ent = extract_uv_entropy(flows, cfg)
    np.testing.assert_array_equal(np.asarray(ent), np.asarray(flows[0][..., 2:4]))


def test_sparse_cov(rng):
    flows = make_flows(rng, 4, 10)
    cfg = Config({"approx": "sparse", "inv_cov": False, "cov_supp": 1})
    ent = extract_uv_entropy(flows, cfg)
    np.testing.assert_array_equal(np.asarray(ent), np.asarray(flows[0][..., 2:4]))


def test_sparse_inv_cov(rng):
    # log-diag kept positive-definite-ish: strong diagonal.
    f2 = np.zeros((B, H2, W2, 8), np.float32)
    f2[..., 0:2] = rng.randn(B, H2, W2, 2)
    f2[..., 2:4] = 1.0  # log precision sqrt
    f2[..., 4:8] = rng.randn(B, H2, W2, 4) * 0.1
    flows = make_flows(rng, 4, 8)
    flows[2] = jnp.asarray(f2)
    cfg = Config({"approx": "sparse", "inv_cov": True, "cov_supp": 1})
    ent = extract_uv_entropy(flows, cfg)
    assert ent.shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(ent)).all()


def test_lowrank(rng):
    cols = 3
    flows = make_flows(rng, 2, 2 + 2 * cols)
    cfg = Config({"approx": "lowrank", "columns": cols})
    ent = extract_uv_entropy(flows, cfg)
    assert ent.shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(ent)).all()


def test_mixture(rng):
    k = 2
    flows = make_flows(rng, 4 * k, 4 * k)
    cfg = Config({"approx": "mixture", "n_components": k})
    ent = extract_uv_entropy(flows, cfg, rng=jax.random.PRNGKey(0))
    assert ent.shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(ent)).all()
