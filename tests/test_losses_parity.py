"""Parity tests: losses vs reference PyTorch implementations.

Stochastic losses (ELBO) are compared with injected noise: the reference's
``Normal.sample`` / ``torch.multinomial`` are stubbed to return the same
draws we feed our loss via ``noise=``.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import import_reference
from arflow_tpu.config import Config
from arflow_tpu.losses import UFlowLoss, UFlowElboLoss

uflow_loss_ref = import_reference("losses.uflow_loss")
uflow_elbo_ref = import_reference("losses.uflow_elbo_loss")

B, H2, W2 = 2, 12, 16  # level-2 resolution
H, W = H2 * 4, W2 * 4


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class StubNormal:
    """Replacement for torch.distributions.Normal feeding preset draws."""

    def __init__(self, draws):
        self.draws = list(draws)

    def sample(self, size):
        draw = self.draws.pop(0)
        assert tuple(size) == tuple(draw.shape), (size, draw.shape)
        return torch.from_numpy(draw)


def make_flows(rng, channels, scale=2.0):
    """6-level flow list; only level 2 is used by these losses."""
    lvl2 = (rng.randn(B, H2, W2, channels) * scale).astype(np.float32)
    # log-diag channels shrunk to sane values
    dummy = np.zeros((B, H2, W2, channels), np.float32)
    return [dummy, dummy, lvl2, dummy, dummy, dummy]


def to_ref_resdict(res):
    return {
        k: [nchw(lvl) for lvl in v] if isinstance(v, list) else torch.from_numpy(v)
        for k, v in res.items()
    }


def test_uflow_loss_parity(rng):
    cfg = Config(
        {
            "type": "uflow",
            "w_census": 1.0,
            "w_smooth": 4.0,
            "smooth_order": 1,
            "edge_constant": 150.0,
            "with_bk": True,
        }
    )
    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    flows_fw = [
        (rng.randn(B, H // (2**max(i, 0)) if i < 3 else H2, 1, 1) * 0).astype(np.float32)
        for i in range(6)
    ]
    # Build proper per-level flows: level 0 full res, level 2 quarter res.
    fw0 = (rng.randn(B, H, W, 2) * 4).astype(np.float32)
    bw0 = (rng.randn(B, H, W, 2) * 4).astype(np.float32)
    fw2 = (rng.randn(B, H2, W2, 2) * 1).astype(np.float32)
    bw2 = (rng.randn(B, H2, W2, 2) * 1).astype(np.float32)
    zeros = np.zeros((B, 2, 2, 2), np.float32)
    res = {
        "flows_fw": [fw0, zeros, fw2, zeros, zeros, zeros],
        "flows_bw": [bw0, zeros, bw2, zeros, zeros, zeros],
    }

    ours = jax.jit(UFlowLoss(cfg).__call__)(
        {k: [jnp.asarray(l) for l in v] for k, v in res.items()},
        jnp.asarray(img1),
        jnp.asarray(img2),
    )

    ref = uflow_loss_ref.UFlowLoss(cfg)
    # Reference signature: output = list of cat(fw, bw) NCHW; target (B,6,H,W)
    output = [
        torch.cat([nchw(f), nchw(b)], dim=1)
        for f, b in zip(res["flows_fw"], res["flows_bw"])
    ]
    target = torch.cat([nchw(img1), nchw(img2)], dim=1)
    total, l_ph, l_sm, flow_mean, mask = ref(output, target)

    np.testing.assert_allclose(float(ours["total"]), total.item(), rtol=2e-4)
    np.testing.assert_allclose(float(ours["l_ph"]), l_ph.item(), rtol=2e-4)
    np.testing.assert_allclose(float(ours["l_sm"]), l_sm.item(), rtol=2e-4)
    np.testing.assert_allclose(float(ours["flow_mean"]), flow_mean.item(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["mask1"]), nhwc(mask), atol=1e-5)


def test_uflow_loss_smooth_order2(rng):
    cfg = Config(
        {
            "type": "uflow",
            "w_census": 1.0,
            "w_smooth": 2.0,
            "smooth_order": 2,
            "edge_constant": 100.0,
            "with_bk": False,
        }
    )
    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    fw0 = (rng.randn(B, H, W, 2) * 4).astype(np.float32)
    bw0 = (rng.randn(B, H, W, 2) * 4).astype(np.float32)
    fw2 = (rng.randn(B, H2, W2, 2)).astype(np.float32)
    bw2 = (rng.randn(B, H2, W2, 2)).astype(np.float32)
    zeros = np.zeros((B, 2, 2, 2), np.float32)
    res = {
        "flows_fw": [fw0, zeros, fw2, zeros, zeros, zeros],
        "flows_bw": [bw0, zeros, bw2, zeros, zeros, zeros],
    }
    ours = jax.jit(UFlowLoss(cfg).__call__)(
        {k: [jnp.asarray(l) for l in v] for k, v in res.items()},
        jnp.asarray(img1),
        jnp.asarray(img2),
    )
    ref = uflow_loss_ref.UFlowLoss(cfg)
    output = [
        torch.cat([nchw(f), nchw(b)], dim=1)
        for f, b in zip(res["flows_fw"], res["flows_bw"])
    ]
    target = torch.cat([nchw(img1), nchw(img2)], dim=1)
    total, _, _, _, _ = ref(output, target)
    np.testing.assert_allclose(float(ours["total"]), total.item(), rtol=2e-4)


def elbo_cfg(**overrides):
    base = {
        "type": "uflow_elbo",
        "edge_constant": 150.0,
        "edge_asymp": 0.01,
        "w_smooth": 4.0,
        "order_smooth": 1,
        "isotropic_smooth": True,
        "penalty_smooth": "charbonnier",
        "closed_form_smooth": True,
        "data_loss": ["census"],
        "data_weight": [1.0],
        "data_penalty": ["abs_robust_loss"],
        "w_entropy": 0.1,
        "w_oof": 0.0,
        "w_occ": 0.0,
        "with_bk": True,
        "approx": "diag",
        "n_components": 1,
        "inv_cov": False,
        "approx_entropy": False,
        "occ_type": "sample",
        "n_samples": 1,
        "offdiag_reg": 0.0,
        "natural_grad": False,
        "cov_supp": 1,
        "columns": 3,
    }
    base.update(overrides)
    return Config(base)


def run_elbo_parity(rng, cfg, channels, extra_noise=None, rtol=1e-6):
    # float64 end-to-end: under jit, f32 reduction order differs from torch's,
    # so comparisons are done in double precision.
    n = cfg.n_samples
    img1 = rng.rand(B, H, W, 3).astype(np.float64)
    img2 = rng.rand(B, H, W, 3).astype(np.float64)
    fw2 = (rng.randn(B, H2, W2, channels) * 0.5).astype(np.float64)
    bw2 = (rng.randn(B, H2, W2, channels) * 0.5).astype(np.float64)
    zeros = np.zeros((B, 2, 2, 2), np.float64)
    res = {
        "flows_fw": [zeros, zeros, fw2, zeros, zeros, zeros],
        "flows_bw": [zeros, zeros, bw2, zeros, zeros, zeros],
    }

    if cfg.approx == "lowrank":
        eps_shape = (n * B, 2 * cfg.columns, 1, 1)
    else:
        eps_shape = (n * B, 2, H2, W2)
    eps12 = rng.randn(*eps_shape)
    eps21 = rng.randn(*eps_shape)

    noise = {
        "eps12": jnp.asarray(np.transpose(eps12, (0, 2, 3, 1))),
        "eps21": jnp.asarray(np.transpose(eps21, (0, 2, 3, 1))),
    }
    if extra_noise:
        noise.update(extra_noise)

    ours = jax.jit(
        lambda r, i1, i2, nz: UFlowElboLoss(cfg)(r, i1, i2, noise=nz)
    )(
        {k: [jnp.asarray(l) for l in v] for k, v in res.items()},
        jnp.asarray(img1),
        jnp.asarray(img2),
        noise,
    )

    ref = uflow_elbo_ref.UFlowElboLoss(cfg)
    ref.Normal = StubNormal([eps12, eps21])
    if cfg.approx == "mixture":
        z12 = np.asarray(extra_noise_z[0])
        z21 = np.asarray(extra_noise_z[1])
        orig_multinomial = torch.multinomial
        draws = [torch.from_numpy(z12), torch.from_numpy(z21)]
        torch.multinomial = lambda *a, **k: draws.pop(0)
    try:
        ref_res = {k: [nchw(l) for l in v] for k, v in res.items()}
        total, l_ph, l_sm, l_ent, l_oof, flow12_2, occu12, valid12 = ref(
            ref_res, nchw(img1), nchw(img2)
        )
    finally:
        if cfg.approx == "mixture":
            torch.multinomial = orig_multinomial

    np.testing.assert_allclose(
        np.asarray(ours["flow12_2"]), nhwc(flow12_2), atol=1e-9
    )
    np.testing.assert_allclose(float(ours["l_ph"]), l_ph.item(), rtol=rtol, atol=1e-9)
    if isinstance(l_sm, torch.Tensor):
        np.testing.assert_allclose(
            float(ours["l_sm"]), l_sm.item(), rtol=rtol, atol=1e-9
        )
    np.testing.assert_allclose(
        float(ours["entropy"]), float(l_ent), rtol=rtol, atol=1e-9
    )
    np.testing.assert_allclose(float(ours["total"]), total.item(), rtol=rtol, atol=1e-9)


def test_elbo_diag_closed_form(rng):
    run_elbo_parity(rng, elbo_cfg(), channels=4)


def test_elbo_diag_closed_form_order2(rng):
    run_elbo_parity(rng, elbo_cfg(order_smooth=2), channels=4)


def test_elbo_diag_sampled_smooth(rng):
    run_elbo_parity(
        rng, elbo_cfg(closed_form_smooth=False, n_samples=2), channels=4
    )


def test_elbo_diag_inv_cov(rng):
    run_elbo_parity(
        rng, elbo_cfg(inv_cov=True, closed_form_smooth=False), channels=4
    )


def test_elbo_diag_oof_occ(rng):
    run_elbo_parity(
        rng,
        elbo_cfg(w_oof=0.1, w_occ=0.1, closed_form_smooth=False),
        channels=4,
    )


def test_elbo_sparse(rng):
    cov_supp = 1
    channels = 4 + 2 * ((cov_supp + 1) ** 2 - 1)
    run_elbo_parity(
        rng,
        elbo_cfg(
            approx="sparse",
            cov_supp=cov_supp,
            closed_form_smooth=False,
            offdiag_reg=0.1,
            n_samples=2,
        ),
        channels=channels,
    )


def test_elbo_lowrank(rng):
    cols = 3
    run_elbo_parity(
        rng,
        elbo_cfg(approx="lowrank", columns=cols, closed_form_smooth=False),
        channels=2 + 2 * cols,
    )


extra_noise_z = [None, None]


def test_elbo_mixture(rng):
    k = 2
    n = 2
    z12 = rng.randint(0, k, size=(B, n)).astype(np.int64)
    z21 = rng.randint(0, k, size=(B, n)).astype(np.int64)
    extra_noise_z[0] = z12
    extra_noise_z[1] = z21
    run_elbo_parity(
        rng,
        elbo_cfg(
            approx="mixture",
            n_components=k,
            n_samples=n,
            closed_form_smooth=False,
        ),
        channels=4 * k,
        extra_noise={"z12": jnp.asarray(z12), "z21": jnp.asarray(z21)},
    )
