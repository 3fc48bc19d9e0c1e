"""Parity tests: arflow_tpu.ops vs the reference PyTorch implementations.

Every op is checked against the corresponding torch function from
/root/reference on random inputs (NCHW<->NHWC transposed at the boundary).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_oracle import import_reference

import arflow_tpu.ops as ops

uflow_utils = import_reference("utils.uflow_utils")
warp_utils = import_reference("utils.warp_utils")


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).float()


def nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


B, H, W = 2, 12, 16


@pytest.fixture
def imgs(rng):
    return rng.rand(B, H, W, 3).astype(np.float32)


@pytest.fixture
def flow(rng):
    return (rng.randn(B, H, W, 2) * 2.5).astype(np.float32)


def assert_close(ours, theirs, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=rtol)


def test_flow_to_warp(flow):
    ours = ops.flow_to_warp(jnp.asarray(flow))
    theirs = nhwc(uflow_utils.flow_to_warp(nchw(flow)))
    assert_close(ours, theirs)


def test_mask_invalid(flow):
    coords = ops.flow_to_warp(jnp.asarray(flow))
    ours = ops.mask_invalid(coords)
    theirs = nhwc(uflow_utils.mask_invalid(uflow_utils.flow_to_warp(nchw(flow))))
    assert_close(ours, theirs)


def test_resample(imgs, flow):
    coords = ops.flow_to_warp(jnp.asarray(flow))
    ours = ops.resample(jnp.asarray(imgs), coords)
    theirs = nhwc(
        uflow_utils.resample(nchw(imgs), uflow_utils.flow_to_warp(nchw(flow)))
    )
    assert_close(ours, theirs, atol=1e-4)


@pytest.mark.parametrize("pad", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_flow_warp(imgs, flow, pad, align_corners):
    ours = ops.flow_warp(
        jnp.asarray(imgs), jnp.asarray(flow), pad=pad, align_corners=align_corners
    )
    theirs = nhwc(
        warp_utils.flow_warp(
            nchw(imgs), nchw(flow), pad=pad, align_corners=align_corners
        )
    )
    assert_close(ours, theirs, atol=1e-4)


def test_border_mask(flow):
    ours = ops.border_mask(jnp.asarray(flow))
    theirs = nhwc(warp_utils.border_mask(nchw(flow)))
    assert_close(ours, theirs)


@pytest.mark.parametrize("scale,is_flow", [(2.0, True), (2.0, False), (4.0, True)])
def test_upsample(flow, scale, is_flow):
    ours = ops.upsample(jnp.asarray(flow), is_flow=is_flow, scale_factor=scale)
    theirs = nhwc(uflow_utils.upsample(nchw(flow), is_flow=is_flow, scale_factor=scale))
    assert_close(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("scale", [2.0, 4.0])
def test_downsample(imgs, scale):
    ours = ops.downsample(jnp.asarray(imgs), is_flow=False, scale_factor=scale)
    theirs = nhwc(uflow_utils.downsample(nchw(imgs), is_flow=False, scale_factor=scale))
    assert_close(ours, theirs, atol=1e-5)


def test_resize_bilinear_align_corners(imgs):
    ours = ops.resize_bilinear(jnp.asarray(imgs), (H * 2, W * 2), align_corners=True)
    theirs = nhwc(
        torch.nn.functional.interpolate(
            nchw(imgs), scale_factor=2, mode="bilinear", align_corners=True
        )
    )
    assert_close(ours, theirs, atol=1e-5)


def test_resize_area(imgs):
    ours = ops.resize_area(jnp.asarray(imgs), (H // 2, W // 4))
    theirs = nhwc(
        torch.nn.functional.interpolate(nchw(imgs), (H // 2, W // 4), mode="area")
    )
    assert_close(ours, theirs, atol=1e-5)


def test_resize_flow(flow):
    flow_utils = import_reference("utils.flow_utils")
    ours = ops.resize_flow(jnp.asarray(flow), (H * 2, W * 2), align_corners=False)
    theirs = nhwc(
        flow_utils.resize_flow(nchw(flow), (H * 2, W * 2), align_corners=False)
    )
    assert_close(ours, theirs, atol=1e-5)


def test_image_grads(imgs):
    ours_x, ours_y = ops.image_grads(jnp.asarray(imgs))
    theirs_x, theirs_y = uflow_utils.image_grads(nchw(imgs))
    assert_close(ours_x, nhwc(theirs_x))
    assert_close(ours_y, nhwc(theirs_y))
    ours_x2, ours_y2 = ops.image_grads(jnp.asarray(imgs), stride=2)
    theirs_x2, theirs_y2 = uflow_utils.image_grads(nchw(imgs), stride=2)
    assert_close(ours_x2, nhwc(theirs_x2))
    assert_close(ours_y2, nhwc(theirs_y2))


def test_census_loss(imgs, rng):
    imgs_b = rng.rand(B, H, W, 3).astype(np.float32)
    mask = rng.rand(B, H, W, 1).astype(np.float32)
    ours = ops.census_loss(jnp.asarray(imgs), jnp.asarray(imgs_b), jnp.asarray(mask))
    theirs = uflow_utils.census_loss(nchw(imgs), nchw(imgs_b), nchw(mask)).item()
    np.testing.assert_allclose(float(ours), theirs, rtol=1e-4)


def test_census_loss_no_penalty(imgs, rng):
    imgs_b = rng.rand(B, H, W, 3).astype(np.float32)
    mask = rng.rand(B, H, W, 1).astype(np.float32)
    ours_l, ours_w = ops.census_loss_no_penalty(
        jnp.asarray(imgs), jnp.asarray(imgs_b), jnp.asarray(mask)
    )
    theirs_l, theirs_w = uflow_utils.census_loss_no_penalty(
        nchw(imgs), nchw(imgs_b), nchw(mask)
    )
    assert_close(ours_l, nhwc(theirs_l), atol=1e-4)
    assert_close(ours_w, nhwc(theirs_w), atol=1e-6)


def test_ssim_loss(imgs, rng):
    imgs_b = rng.rand(B, H, W, 3).astype(np.float32)
    mask = rng.rand(B, H, W, 1).astype(np.float32)
    ours, ours_w = ops.ssim_loss(
        jnp.asarray(imgs), jnp.asarray(imgs_b), jnp.asarray(mask)
    )
    theirs, theirs_w = uflow_utils.ssim_loss(nchw(imgs), nchw(imgs_b), nchw(mask))
    assert_close(ours[0], nhwc(theirs[0]), atol=1e-5)
    assert_close(ours[1], nhwc(theirs[1]), atol=1e-5)
    assert_close(ours_w, nhwc(theirs_w), atol=1e-6)


def test_ssim_dist_arflow(imgs, rng):
    loss_blocks = import_reference("losses.loss_blocks")
    imgs_b = rng.rand(B, H, W, 3).astype(np.float32)
    ours = ops.ssim_dist(jnp.asarray(imgs), jnp.asarray(imgs_b))
    theirs = nhwc(loss_blocks.SSIM(nchw(imgs), nchw(imgs_b)))
    assert_close(ours, theirs, atol=1e-5)


def test_compute_range_map(flow):
    ours = ops.compute_range_map(jnp.asarray(flow))
    theirs = nhwc(warp_utils.compute_range_map(nchw(flow)))
    assert_close(ours, theirs, atol=1e-4)


def test_compute_range_map_uflow_convention(flow):
    # utils/uflow_utils.py:80-160 flips coords but is numerically identical.
    ours = ops.compute_range_map(jnp.asarray(flow))
    theirs = nhwc(uflow_utils.compute_range_map(nchw(flow)))
    assert_close(ours, theirs, atol=1e-4)


def test_occu_mask_bidirection(flow, rng):
    flow21 = (rng.randn(B, H, W, 2) * 2.5).astype(np.float32)
    ours = ops.get_occu_mask_bidirection(jnp.asarray(flow), jnp.asarray(flow21))
    theirs = nhwc(warp_utils.get_occu_mask_bidirection(nchw(flow), nchw(flow21)))
    assert_close(ours, theirs)


def test_occu_mask_backward(flow):
    ours = ops.get_occu_mask_backward(jnp.asarray(flow), th=0.2)
    theirs = nhwc(warp_utils.get_occu_mask_backward(nchw(flow), th=0.2))
    assert_close(ours, theirs)
    ours0 = ops.get_occu_mask_backward(jnp.asarray(flow), th=0.0)
    theirs0 = nhwc(warp_utils.get_occu_mask_backward(nchw(flow), th=0.0))
    assert_close(ours0, theirs0, atol=1e-5)


def test_cost_volume(rng):
    uflow_model = import_reference("models.uflow_model")
    c = 16
    f1 = rng.randn(B, H, W, c).astype(np.float32)
    f2 = rng.randn(B, H, W, c).astype(np.float32)
    ours = ops.compute_cost_volume(
        jnp.asarray(f1), jnp.asarray(f2), max_displacement=4, use_pallas=False
    )
    theirs = nhwc(
        uflow_model.compute_cost_volume(nchw(f1), nchw(f2), max_displacement=4)
    )
    assert_close(ours, theirs, atol=1e-5)


def test_correlation_native(rng):
    corr_native = import_reference("models.correlation_native")
    c = 16
    f1 = rng.randn(B, H, W, c).astype(np.float32)
    f2 = rng.randn(B, H, W, c).astype(np.float32)
    corr = corr_native.Correlation(
        pad_size=4, kernel_size=1, max_displacement=4, stride1=1, stride2=1
    )
    ours = ops.compute_cost_volume(
        jnp.asarray(f1), jnp.asarray(f2), max_displacement=4, use_pallas=False
    )
    theirs = nhwc(corr(nchw(f1), nchw(f2)))
    assert_close(ours, theirs, atol=1e-5)


def test_normalize_features(rng):
    uflow_model = import_reference("models.uflow_model")
    c = 16
    f1 = rng.randn(B, H, W, c).astype(np.float32) * 3 + 1
    f2 = rng.randn(B, H, W, c).astype(np.float32) * 2 - 1
    ours = ops.normalize_features(
        [jnp.asarray(f1), jnp.asarray(f2)],
        normalize=True,
        center=True,
        moments_across_channels=True,
        moments_across_images=True,
    )
    theirs = uflow_model.normalize_features(
        [nchw(f1), nchw(f2)],
        normalize=True,
        center=True,
        moments_across_channels=True,
        moments_across_images=True,
    )
    assert_close(ours[0], nhwc(theirs[0]), atol=1e-5)
    assert_close(ours[1], nhwc(theirs[1]), atol=1e-5)


def test_penalties(rng):
    penalty_functions = import_reference("losses.penalty_functions")
    x = rng.rand(64).astype(np.float32) * 4
    for name in ["identity", "charbonnier", "abs_robust_loss"]:
        ours = ops.get_penalty(name)(jnp.asarray(x))
        theirs = penalty_functions.get_penalty(name)(torch.from_numpy(x)).numpy()
        assert_close(ours, theirs, atol=1e-6)
    for name in ["identity", "charbonnier"]:
        ours = ops.get_penalty(name, derivative=True)(jnp.asarray(x))
        theirs = penalty_functions.get_penalty(name, derivative=True)(
            torch.from_numpy(x)
        ).numpy()
        assert_close(ours, theirs, atol=1e-6)


def test_log_gmm(rng):
    uflow_elbo_loss = import_reference("losses.uflow_elbo_loss")
    x = rng.randn(4, 5).astype(np.float32)
    pi = [0.6, 0.3, 0.1]
    beta = [3.0, 0.1, 0.01]
    ours = ops.log_gmm(jnp.asarray(x), pi, beta)
    theirs = uflow_elbo_loss.log_gmm(torch.from_numpy(x), pi, beta).numpy()
    assert_close(ours, theirs, atol=1e-4, rtol=1e-4)
