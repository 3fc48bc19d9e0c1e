"""Parity tests for the ARFlow-era losses (unflow / elbo / fullres).

The reference's unflow ternary path crashes (DIVERGENCES.md #6), so the
unflow comparison runs with w_ternary=0; fullres uses the (dist, mask)
tuple correctly and is tested with all terms. The reference ElboLoss calls
.cuda() unconditionally (DIVERGENCES.md #7) — torch.Tensor.cuda is patched
to identity for the oracle.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import import_reference
from arflow_tpu.config import Config
from arflow_tpu.losses import ElboLoss, FullResLoss, UnFlowLoss

flow_loss_ref = import_reference("losses.flow_loss")
fullres_ref = import_reference("losses.fullres_loss")

B, H, W = 2, 32, 48


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def make_pyramid(rng, with_var=False):
    """5-level flow pyramid, finest-first: [full, 1/4, 1/8, 1/16, 1/32]."""
    shapes = [(H, W), (H // 4, W // 4), (H // 8, W // 8), (H // 16, W // 16)]
    ch = 8 if with_var else 4
    levels = []
    for h, w in shapes:
        arr = (rng.randn(B, h, w, ch) * 1.5).astype(np.float32)
        if with_var:
            arr[..., 2:4] = np.clip(arr[..., 2:4], -2, 2)
            arr[..., 6:8] = np.clip(arr[..., 6:8], -2, 2)
        levels.append(arr)
    return levels


def split_res(levels, with_var=False):
    if with_var:
        fw = [l[..., 0:4] for l in levels]
        bw = [l[..., 4:8] for l in levels]
    else:
        fw = [l[..., 0:2] for l in levels]
        bw = [l[..., 2:4] for l in levels]
    return {"flows_fw": [jnp.asarray(f) for f in fw],
            "flows_bw": [jnp.asarray(b) for b in bw]}


def test_unflow_loss_zero_level0_weight(rng):
    """w_scales[0]==0 crashes the reference (flow_loss.py:80-84 IndexError);
    ours derives the l0 occlusion mask and normalizer on demand (div #27).
    The per-level photometric terms must decompose linearly, proving the
    skipped-l0 path uses the SAME masks/s as the all-level path."""
    base = {
        "type": "unflow", "w_l1": 0.15, "w_ssim": 0.85, "w_ternary": 0.0,
        "w_smooth": 75.0, "alpha": 10.0, "w_sm_scales": [1.0, 0.0, 0.0, 0.0],
        "occ_from_back": True, "smooth_2nd": False, "warp_pad": "border",
        "with_bk": True,
    }
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    res = split_res(make_pyramid(rng))

    def run(ws):
        cfg = Config(dict(base, w_scales=ws))
        return jax.jit(UnFlowLoss(cfg).__call__)(res, img1, img2)

    full = run([1.0, 1.0, 1.0, 0.0])
    tail = run([0.0, 1.0, 1.0, 0.0])
    head = run([1.0, 0.0, 0.0, 0.0])
    assert np.isfinite(float(tail["total"]))
    # level 0 skipped => its smooth term is 0 and w_sm_scales[0] has no effect
    assert float(tail["l_sm"]) == 0.0
    np.testing.assert_allclose(
        float(tail["l_ph"]) + float(head["l_ph"]), float(full["l_ph"]), rtol=1e-5
    )


@pytest.mark.parametrize("occ_from_back,smooth_2nd", [(False, False), (True, True)])
def test_unflow_loss_parity(rng, occ_from_back, smooth_2nd):
    cfg = Config(
        {
            "type": "unflow", "w_l1": 0.15, "w_ssim": 0.85, "w_ternary": 0.0,
            "w_smooth": 75.0, "alpha": 10.0, "w_scales": [1.0, 1.0, 1.0, 0.0],
            "w_sm_scales": [1.0, 0.0, 0.0, 0.0], "occ_from_back": occ_from_back,
            "smooth_2nd": smooth_2nd, "warp_pad": "border", "with_bk": True,
        }
    )
    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    levels = make_pyramid(rng)
    res = split_res(levels)

    ours = jax.jit(UnFlowLoss(cfg).__call__)(res, jnp.asarray(img1), jnp.asarray(img2))

    ref = flow_loss_ref.unFlowLoss(cfg)
    output = [nchw(l) for l in levels]
    target = torch.cat([nchw(img1), nchw(img2)], dim=1)
    total, warp, smooth, flow_mean = ref(output, target)
    np.testing.assert_allclose(float(ours["total"]), total.item(), rtol=2e-4)
    np.testing.assert_allclose(float(ours["l_ph"]), warp.item(), rtol=2e-4)
    np.testing.assert_allclose(
        float(ours["l_sm"]), smooth.item(), rtol=2e-4, atol=1e-7
    )
    np.testing.assert_allclose(float(ours["flow_mean"]), flow_mean.item(), rtol=1e-5)


def test_elbo_loss_parity(rng):
    # Patch the reference's unconditional .cuda() (losses/elbo_loss.py:14-15).
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        elbo_ref = import_reference("losses.elbo_loss")
        cfg = Config(
            {
                "type": "elbo", "w_l1": 0.15, "w_ssim": 0.85, "w_ternary": 0.0,
                "w_smooth": 75.0, "alpha": 10.0,
                "w_scales": [1.0, 1.0, 1.0, 0.0],
                "w_sm_scales": [1.0, 0.0, 0.0, 0.0],
                "w_en_scales": [1.0, 0.0, 0.0, 0.0],
                "w_entropy": 0.1, "occ_from_back": False, "smooth_2nd": False,
                "warp_pad": "border", "with_bk": True,
            }
        )
        img1 = rng.rand(B, H, W, 3).astype(np.float32)
        img2 = rng.rand(B, H, W, 3).astype(np.float32)
        levels = make_pyramid(rng, with_var=True)
        res = split_res(levels, with_var=True)

        # Inject identical per-level noise on both sides.
        noise = {}
        draws = []
        for i, l in enumerate(levels):
            h, w = l.shape[1], l.shape[2]
            e_fw = rng.randn(B, 2, h, w).astype(np.float32)
            e_bw = rng.randn(B, 2, h, w).astype(np.float32)
            noise[f"eps_fw_{i}"] = jnp.asarray(np.transpose(e_fw, (0, 2, 3, 1)))
            noise[f"eps_bw_{i}"] = jnp.asarray(np.transpose(e_bw, (0, 2, 3, 1)))
            draws += [e_fw, e_bw]

        ours = jax.jit(
            lambda r, a, b, nz: ElboLoss(cfg)(r, a, b, noise=nz)
        )(res, jnp.asarray(img1), jnp.asarray(img2), noise)

        ref = elbo_ref.ElboLoss(cfg)

        class StubNormal:
            def __init__(self, q):
                self.q = list(q)

            def sample(self, size):
                d = self.q.pop(0)
                assert tuple(size) == tuple(d.shape), (size, d.shape)
                return torch.from_numpy(d)

        ref.Normal = StubNormal(draws)
        output = [nchw(l) for l in levels]
        target = torch.cat([nchw(img1), nchw(img2)], dim=1)
        total, warp, smooth, entropy, flow_mean = ref(output, target)
        np.testing.assert_allclose(float(ours["total"]), total.item(), rtol=3e-4)
        np.testing.assert_allclose(float(ours["l_ph"]), warp.item(), rtol=3e-4)
        np.testing.assert_allclose(
            float(ours["l_sm"]), smooth.item(), rtol=3e-4, atol=1e-7
        )
        np.testing.assert_allclose(
            float(ours["entropy"]), entropy.item(), rtol=3e-4, atol=1e-7
        )
    finally:
        torch.Tensor.cuda = orig_cuda


# occ "none" is broken in the reference (2-ch mask) — tested standalone.
@pytest.mark.parametrize("occ_type", ["wang", "wang1", "brox"])
def test_fullres_loss_parity(rng, occ_type):
    # w_ssim=0: the reference's ssim term is shape-broken (DIVERGENCES #21).
    cfg = Config(
        {
            "type": "fullres", "w_l1": 0.15, "w_ssim": 0.0, "w_ternary": 1.0,
            "ternary_distance": 1, "w_smooth": 75.0, "alpha": 10.0,
            "occ_type": occ_type, "wang_thr": 0.2, "warp_pad": "border",
            "align_corners": True, "smooth_2nd": False, "with_bk": True,
        }
    )
    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    levels = make_pyramid(rng)
    res = split_res(levels)

    ours = jax.jit(FullResLoss(cfg).__call__)(
        res, jnp.asarray(img1), jnp.asarray(img2)
    )

    ref = fullres_ref.FullResLoss(cfg)
    output = [nchw(l) for l in levels]
    target = torch.cat([nchw(img1), nchw(img2)], dim=1)
    total, warp, smooth, flow_mean = ref(output, target)
    np.testing.assert_allclose(float(ours["total"]), total.item(), rtol=3e-4)
    np.testing.assert_allclose(float(ours["l_ph"]), warp.item(), rtol=3e-4)
    np.testing.assert_allclose(
        float(ours["l_sm"]), smooth.item(), rtol=3e-4, atol=1e-7
    )


def test_fullres_occ_none_runs(rng):
    cfg = Config(
        {
            "type": "fullres", "w_l1": 0.15, "w_ssim": 0.85, "w_ternary": 1.0,
            "ternary_distance": 1, "w_smooth": 75.0, "alpha": 10.0,
            "occ_type": "none", "wang_thr": 0.2, "warp_pad": "border",
            "align_corners": True, "smooth_2nd": False, "with_bk": True,
        }
    )
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    res = split_res(make_pyramid(rng))
    out = jax.jit(FullResLoss(cfg).__call__)(res, img1, img2)
    assert np.isfinite(float(out["total"]))
