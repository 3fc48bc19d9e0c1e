"""Shared unsupervised-loss building blocks.

- ``data_loss_no_penalty`` / ``smooth_loss_no_penalty``: the uflow-ELBO
  helpers (losses/uflow_elbo_loss.py:18-96). They live here (not inside the
  ELBO loss) so that MixtureWeightsNet can use them without a model->loss
  dependency inversion (the reference imports loss helpers inside the model,
  models/uflow_prob_model.py:8 — flagged in SURVEY.md §7.3).
- ARFlow-era blocks: ``ternary_loss``, ``smooth_grad_1st/2nd``
  (losses/loss_blocks.py:12-124).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from arflow_tpu.ops import (
    census_loss_no_penalty,
    compute_range_map,
    downsample,
    flow_to_warp,
    image_grads,
    mask_invalid,
    resample,
    resample_with_grads,
    ssim_loss,
    upsample,
)
from arflow_tpu.ops.census import extract_patches, rgb_to_grayscale


def taylor_warp_enabled(default: bool = False) -> bool:
    """Opt-in Taylor-warp for MC flow samples (documented divergence,
    DIVERGENCES.md): reconstruct each sample as

        resample(im, warp(mean)) + grad(im)|_{warp(mean)} . (flow_s - mean)

    — ONE packed 4-tap gather at the posterior mean instead of n_samples
    gathers, with the interpolant's exact within-cell spatial partials from
    the same taps (ops/warp.py resample_with_grads). First-order accurate
    in the sample perturbation (exact while mean and sample share a 2x2
    cell; posterior std is sub-pixel in trained models).
    ``ARFLOW_TAYLOR_WARP=0/1`` force-overrides at trace time."""
    env = os.environ.get("ARFLOW_TAYLOR_WARP")
    if env is not None:
        return env == "1"
    return default


def data_loss_no_penalty(
    im1_0,
    im2_0,
    flow12_2,
    flow21_2,
    occ_type: str,
    data_loss,
    mean12_2=None,
    mean21_2=None,
):
    """Per-pixel data losses + weights before penalties
    (losses/uflow_elbo_loss.py:18-78). All tensors NHWC; flows at 1/4 res.

    Returns (pixel_loss_list, pixel_weight_list, occu_mask_2, valid_mask_0).
    """
    flow12_0 = upsample(flow12_2, is_flow=True, scale_factor=4.0)
    warp12_0 = flow_to_warp(flow12_0)
    im1_recons = resample(lax.stop_gradient(im2_0), warp12_0)

    if occ_type == "mean":
        mean12_0 = upsample(mean12_2, is_flow=True, scale_factor=4.0)
        valid_mask_0 = mask_invalid(flow_to_warp(mean12_0))
        occu_mask_2 = jnp.clip(compute_range_map(mean21_2), 0.0, 1.0)
        occu_mask_0 = upsample(occu_mask_2, is_flow=False, scale_factor=4.0)
        mask_0 = lax.stop_gradient(occu_mask_0 * valid_mask_0)
    elif occ_type == "sample":
        valid_mask_0 = mask_invalid(warp12_0)
        occu_mask_2 = jnp.clip(compute_range_map(flow21_2), 0.0, 1.0)
        occu_mask_0 = upsample(occu_mask_2, is_flow=False, scale_factor=4.0)
        mask_0 = lax.stop_gradient(occu_mask_0 * valid_mask_0)
    elif occ_type == "none":
        valid_mask_0 = mask_invalid(warp12_0)
        occu_mask_2 = None
        mask_0 = lax.stop_gradient(valid_mask_0)
    else:
        raise NotImplementedError(f"Occlusion type {occ_type} not implemented!")

    pixel_loss = []
    pixel_weight = []
    for loss_type in data_loss:
        if loss_type == "census":
            l, w = census_loss_no_penalty(im1_0, im1_recons, mask_0)
        elif loss_type == "ssim":
            l, w = ssim_loss(im1_0, im1_recons, mask_0)
        else:
            raise NotImplementedError(loss_type)
        pixel_loss.append(l)
        pixel_weight.append(w)

    return pixel_loss, pixel_weight, occu_mask_2, valid_mask_0


def _tile_groups(x, n, groups=2):
    """(G*B, ...) -> (G*n*B, ...), each group tiled sample-major."""
    if n == 1:
        return x
    b = x.shape[0] // groups
    xg = x.reshape((groups, 1, b) + x.shape[1:])
    return jnp.broadcast_to(
        xg, (groups, n, b) + x.shape[1:]
    ).reshape((groups * n * b,) + x.shape[1:])


def _taylor_recons_mixture(src_sg, mean_2, flow_0, z, n_rep):
    """Taylor-linearized MC reconstructions for a mixture posterior.

    src_sg: (B,H,W,C) stop-gradient warp source; mean_2: (B,h2,w2,2K)
    component means at 1/4 res; flow_0: (n*B,H,W,2) full-res sampled flows
    (sample-major); z: (B,n) drawn component index per sample.

    One ``resample_with_grads`` per component (K gathers from the B-sized
    source), then each (sample, batch) entry linearizes around the
    component it was drawn from:

        recons = base[z] + gx[z]*(u - u_mean[z]) + gy[z]*(v - v_mean[z])

    Identical approximation quality to the unimodal Taylor path — the
    perturbation around the DRAWN component's mean is the within-component
    std, sub-pixel in trained models.
    """
    bs = z.shape[0]
    n = n_rep
    k = mean_2.shape[-1] // 2
    mean_0 = upsample(mean_2, is_flow=True, scale_factor=4.0)  # (B,H,W,2K)
    taps = []  # per component: (base, gx, gy), each (B,H,W,C)
    for ki in range(k):
        warp_k = flow_to_warp(mean_0[..., 2 * ki : 2 * ki + 2])
        taps.append(resample_with_grads(src_sg, warp_k))
    base_k = jnp.stack([t[0] for t in taps], axis=0)  # (K,B,H,W,C)
    gx_k = jnp.stack([t[1] for t in taps], axis=0)
    gy_k = jnp.stack([t[2] for t in taps], axis=0)
    mean_k = jnp.moveaxis(
        mean_0.reshape(mean_0.shape[:3] + (k, 2)), -2, 0
    )  # (K,B,H,W,2)

    # Sample-major flat index: row s*bs + b selects component z[b, s].
    zi = z.T.reshape(n * bs)  # (n*B,)
    bi = jnp.tile(jnp.arange(bs), n)
    base = base_k[zi, bi]  # (n*B,H,W,C) — whole-image row gather
    gx = gx_k[zi, bi]
    gy = gy_k[zi, bi]
    delta = flow_0 - mean_k[zi, bi]
    return base + gx * delta[..., 0:1] + gy * delta[..., 1:2]


def data_loss_no_penalty_bidir(
    im1_0,
    im2_0,
    flow12_2,
    flow21_2,
    occ_type: str,
    data_loss,
    mean12_2=None,
    mean21_2=None,
    n_rep: int = 1,
    taylor_default: bool = False,
    z12=None,
    z21=None,
):
    """Both directions of ``data_loss_no_penalty`` through ONE batched
    pipeline (TPU-first fast path, same trick as losses/uflow.py).

    The fw and bw data losses are the same program on swapped inputs, so
    every memory-bound stage (flow upsample, range-map splat, census/ssim
    moments, mask upsample) runs once at 2B instead of twice at B. The
    full-res warp gathers stay per-direction — XLA's TPU gather is ~3x
    slower per descriptor at the 2B source size (see losses/uflow.py:94).
    Weight maps are normalized per direction (num_groups=2), so summing the
    penalized 2B batch equals the reference's fw_sum + bw_sum exactly.

    ``n_rep > 1`` is the MC-sample-aware mode (ELBO n_samples): images and
    means come UN-tiled (batch B) while the sampled flows are tiled
    (n_rep*B, sample-major, the ELBO ``_tile`` layout). The warp then
    gathers each sample group from the B-sized source (n small gathers
    beat one gather from an n-times-tiled source — gather cost scales
    with source size on TPU), the target census transform runs once per
    direction, and for occ 'mean' the masks (which are sample-independent)
    are computed at B and broadcast. Identical math to pre-tiling the
    inputs.

    Returns (pixel_loss_list, pixel_weight_list, occu_mask_2, valid_mask_0),
    each batched [fw; bw] along axis 0 (occu_mask_2 is None for occ 'none'),
    tiled to the flows' batch when n_rep > 1.

    For mixture posteriors (2K-channel means) the Taylor path needs the
    sampled component indices ``z12``/``z21`` ((B, n_rep) each, the ELBO's
    categorical draws): each direction then linearizes around its K
    component means — K gathers instead of n_samples — and every MC sample
    reads the taps of the component it was drawn from (exactness unchanged:
    the sample perturbs around THAT component's mean). Without z the
    mixture stays on the exact per-sample path even when the gate is on.
    """
    b = flow12_2.shape[0]  # = n_rep * B
    flow_2 = jnp.concatenate([flow12_2, flow21_2], axis=0)
    flow_0 = upsample(flow_2, is_flow=True, scale_factor=4.0)
    warp_0 = flow_to_warp(flow_0)
    bs = b // n_rep  # un-tiled batch
    im2_sg = lax.stop_gradient(im2_0)
    im1_sg = lax.stop_gradient(im1_0)
    taylor_on = (
        n_rep > 1
        and mean12_2 is not None
        and taylor_warp_enabled(default=taylor_default)
        and (mean12_2.shape[-1] == 2
             or (z12 is not None and z21 is not None))
    )
    if taylor_on and mean12_2.shape[-1] == 2:
        # Opt-in Taylor warp (see taylor_warp_enabled): gather ONCE at the
        # posterior mean per direction, linearize each MC sample around it.
        # n_samples full-res gathers -> 1, the dominant ELBO loss cost.
        mean_2 = jnp.concatenate([mean12_2, mean21_2], axis=0)  # (2bs)
        mean_0 = upsample(mean_2, is_flow=True, scale_factor=4.0)
        warp_m = flow_to_warp(mean_0)
        base2, gx2, gy2 = resample_with_grads(im2_sg, warp_m[:bs])
        base1, gx1, gy1 = resample_with_grads(im1_sg, warp_m[bs:])
        base = jnp.concatenate([base2, base1], axis=0)
        gx = jnp.concatenate([gx2, gx1], axis=0)
        gy = jnp.concatenate([gy2, gy1], axis=0)
        delta = flow_0 - _tile_groups(mean_0, n_rep)  # (2b, H, W, 2)
        recons = (
            _tile_groups(base, n_rep)
            + _tile_groups(gx, n_rep) * delta[..., 0:1]
            + _tile_groups(gy, n_rep) * delta[..., 1:2]
        )
    elif taylor_on:
        # Mixture Taylor warp: one linearization point per COMPONENT (2K
        # channel means) — 2K gathers total instead of 2*n_samples; each
        # sample group selects its drawn component's taps per batch entry.
        recons = jnp.concatenate(
            [
                _taylor_recons_mixture(
                    im2_sg, mean12_2, flow_0[:b], z12, n_rep
                ),
                _taylor_recons_mixture(
                    im1_sg, mean21_2, flow_0[b:], z21, n_rep
                ),
            ],
            axis=0,
        )
    else:
        recons = jnp.concatenate(
            [resample(im2_sg, warp_0[i * bs : (i + 1) * bs])
             for i in range(n_rep)]
            + [
                resample(im1_sg, warp_0[b + i * bs : b + (i + 1) * bs])
                for i in range(n_rep)
            ],
            axis=0,
        )
    targets = jnp.concatenate([im1_0, im2_0], axis=0)  # (2*bs)

    if occ_type == "mean":
        # The mean-flow masks are sample-independent: compute and upsample
        # at 2*bs, broadcast to the sample batch last.
        mean_2 = jnp.concatenate([mean12_2, mean21_2], axis=0)
        mean_0 = upsample(mean_2, is_flow=True, scale_factor=4.0)
        valid_small_0 = mask_invalid(flow_to_warp(mean_0))
        occu_small_2 = jnp.clip(
            compute_range_map(jnp.concatenate([mean21_2, mean12_2], axis=0)),
            0.0,
            1.0,
        )
        occu_small_0 = upsample(occu_small_2, is_flow=False, scale_factor=4.0)
        valid_mask_0 = _tile_groups(valid_small_0, n_rep)
        occu_mask_2 = _tile_groups(occu_small_2, n_rep)
        mask_0 = _tile_groups(
            lax.stop_gradient(occu_small_0 * valid_small_0), n_rep
        )
    elif occ_type == "sample":
        valid_mask_0 = mask_invalid(warp_0)
        occu_mask_2 = jnp.clip(
            compute_range_map(jnp.concatenate([flow21_2, flow12_2], axis=0)),
            0.0,
            1.0,
        )
        occu_mask_0 = upsample(occu_mask_2, is_flow=False, scale_factor=4.0)
        mask_0 = lax.stop_gradient(occu_mask_0 * valid_mask_0)
    elif occ_type == "none":
        valid_mask_0 = mask_invalid(warp_0)
        occu_mask_2 = None
        mask_0 = lax.stop_gradient(valid_mask_0)
    else:
        raise NotImplementedError(f"Occlusion type {occ_type} not implemented!")

    pixel_loss = []
    pixel_weight = []
    for loss_type in data_loss:
        if loss_type == "census":
            l, w = census_loss_no_penalty(
                targets, recons, mask_0, num_groups=2, a_rep=n_rep
            )
        elif loss_type == "ssim":
            l, w = ssim_loss(
                _tile_groups(targets, n_rep), recons, mask_0, num_groups=2
            )
        else:
            raise NotImplementedError(loss_type)
        pixel_loss.append(l)
        pixel_weight.append(w)

    return pixel_loss, pixel_weight, occu_mask_2, valid_mask_0


def smooth_loss_no_penalty(im1_0, flow12_2, edge_constant, edge_asymp):
    """First-order flow gradients + edge-aware weights at 1/4 res
    (losses/uflow_elbo_loss.py:81-96)."""
    im1_2 = downsample(im1_0, is_flow=False, scale_factor=4.0)
    im1_gx, im1_gy = image_grads(lax.stop_gradient(im1_2))
    weights_x = edge_asymp + (1.0 - edge_asymp) * jnp.exp(
        -jnp.mean(jnp.abs(edge_constant * im1_gx), axis=-1, keepdims=True)
    )
    weights_y = edge_asymp + (1.0 - edge_asymp) * jnp.exp(
        -jnp.mean(jnp.abs(edge_constant * im1_gy), axis=-1, keepdims=True)
    )
    flow12_x, flow12_y = image_grads(flow12_2)
    return flow12_x, weights_x / 2.0, flow12_y, weights_y / 2.0


def edge_weights(image, edge_constant, edge_asymp=0.0, stride=1):
    """exp edge-aware weights (losses/uflow_elbo_loss.py:88-90 pattern)."""
    gx, gy = image_grads(lax.stop_gradient(image), stride=stride)
    wx = edge_asymp + (1.0 - edge_asymp) * jnp.exp(
        -jnp.mean(jnp.abs(edge_constant * gx), axis=-1, keepdims=True)
    )
    wy = edge_asymp + (1.0 - edge_asymp) * jnp.exp(
        -jnp.mean(jnp.abs(edge_constant * gy), axis=-1, keepdims=True)
    )
    return wx, wy


# ---------------------------------------------------------------------------
# ARFlow-era blocks (losses/loss_blocks.py)
# ---------------------------------------------------------------------------

def ternary_loss(im, im_warp, max_distance: int = 1, sum_dist: bool = False):
    """Census/ternary distance + valid mask (losses/loss_blocks.py:12-62).

    Returns (dist, mask): dist (B,H,W,1), mask (B,H,W,1) zeroed on the border.
    """
    patch_size = 2 * max_distance + 1

    def _transform(image):
        intensities = rgb_to_grayscale(image) * 255.0
        patches = extract_patches(intensities, patch_size)
        transf = patches - intensities
        return transf / jnp.sqrt(0.81 + jnp.square(transf))

    t1 = _transform(im)
    t2 = _transform(im_warp)
    dist = jnp.square(t1 - t2)
    dist_norm = dist / (0.1 + dist)
    if sum_dist:
        dist_mean = jnp.sum(dist_norm, axis=-1, keepdims=True)
    else:
        dist_mean = jnp.mean(dist_norm, axis=-1, keepdims=True)

    b, h, w, _ = im.shape
    pad = max_distance
    inner = jnp.zeros((h, w, 1), im.dtype).at[pad : h - pad, pad : w - pad].set(1.0)
    mask = jnp.broadcast_to(inner, (b, h, w, 1))
    return dist_mean, mask


def penalty_uflow(x):
    return jnp.sqrt(jnp.square(x) + 0.001**2)


def smooth_grad_1st(flo, image, alpha, penalty: str = "abs"):
    """1st-order edge-aware smoothness (losses/loss_blocks.py:93-110)."""
    img_dx, img_dy = image_grads(image)
    weights_x = jnp.exp(-jnp.mean(jnp.abs(img_dx), axis=-1, keepdims=True) * alpha)
    weights_y = jnp.exp(-jnp.mean(jnp.abs(img_dy), axis=-1, keepdims=True) * alpha)
    dx, dy = image_grads(flo)
    if penalty == "abs":
        loss_x = weights_x * jnp.abs(dx) / 2.0
        loss_y = weights_y * jnp.abs(dy) / 2.0
    elif penalty == "uflow":
        loss_x = weights_x * penalty_uflow(dx) / 2.0
        loss_y = weights_y * penalty_uflow(dy) / 2.0
    else:
        raise NotImplementedError(penalty)
    return jnp.mean(loss_x) / 2.0 + jnp.mean(loss_y) / 2.0


def smooth_grad_2nd(flo, image, alpha, penalty: str = "abs"):
    """2nd-order edge-aware smoothness (losses/loss_blocks.py:113-124)."""
    img_dx, img_dy = image_grads(image)
    weights_x = jnp.exp(-jnp.mean(jnp.abs(img_dx), axis=-1, keepdims=True) * alpha)
    weights_y = jnp.exp(-jnp.mean(jnp.abs(img_dy), axis=-1, keepdims=True) * alpha)
    dx, dy = image_grads(flo)
    dx2, _ = image_grads(dx)
    _, dy2 = image_grads(dy)
    loss_x = weights_x[:, :, 1:, :] * jnp.abs(dx2)
    loss_y = weights_y[:, 1:, :, :] * jnp.abs(dy2)
    return jnp.mean(loss_x) / 2.0 + jnp.mean(loss_y) / 2.0
