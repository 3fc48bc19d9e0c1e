"""Full-resolution photometric loss with selectable occlusion handling.

Reference: losses/fullres_loss.py:9-107. Photometric terms at level 0
(normalized by mask sums), smoothness at level 2; occlusion via wang (range
map threshold), wang1 (clamped range map), brox (bidirectional), or none.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from arflow_tpu.losses.blocks import (
    smooth_grad_1st,
    smooth_grad_2nd,
    ternary_loss,
)
from arflow_tpu.ops import (
    border_mask,
    compute_range_map,
    flow_warp,
    get_occu_mask_backward,
    get_occu_mask_bidirection,
    resize_bilinear,
    ssim_dist,
)
from arflow_tpu.ops.census import abs_robust_loss


class FullResLoss:
    """cfg: w_l1, w_ssim, w_ternary, ternary_distance, w_smooth, alpha,
    occ_type (wang|wang1|brox|none), wang_thr, warp_pad, align_corners,
    smooth_2nd, with_bk."""

    def __init__(self, cfg):
        self.cfg = cfg

    def loss_photometric(self, im, im_recons, occu_mask):
        cfg = self.cfg
        loss = 0.0
        if cfg.w_l1 > 0:
            l1 = cfg.w_l1 * jnp.abs(im - im_recons) * occu_mask
            loss = loss + jnp.sum(l1) / (jnp.sum(occu_mask) + 1e-6)
        if cfg.w_ssim > 0:
            # NOTE: the reference multiplies the VALID-pooled SSIM map
            # (H-2, W-2) by the full-size mask — a broadcast error
            # (fullres_loss.py:22-24 vs loss_blocks.py:70-74); the working
            # semantics here center-crop the mask to the SSIM support.
            ssim_map = ssim_dist(im_recons, im)
            mask_c = occu_mask[:, 1:-1, 1:-1, :]
            ssim = cfg.w_ssim * ssim_map * mask_c
            loss = loss + jnp.sum(ssim) / (jnp.sum(mask_c) + 1e-6)
        if cfg.w_ternary > 0:
            dist, valid_mask = ternary_loss(
                im, im_recons, max_distance=cfg.ternary_distance, sum_dist=True
            )
            mask = lax.stop_gradient(valid_mask * occu_mask)
            tern = cfg.w_ternary * abs_robust_loss(dist) * mask
            loss = loss + jnp.sum(tern) / (jnp.sum(mask) + 1e-6)
        return loss

    def loss_smooth(self, flow, im_scaled):
        if self.cfg.get("smooth_2nd", False):
            return smooth_grad_2nd(flow, im_scaled, self.cfg.alpha) * 2.0
        return smooth_grad_1st(flow, im_scaled, self.cfg.alpha, penalty="uflow") * 2.0

    def __call__(self, res_dict, img1, img2):
        cfg = self.cfg
        flows_fw, flows_bw = res_dict["flows_fw"], res_dict["flows_bw"]
        flow12_0 = flows_fw[0][..., 0:2]
        flow21_0 = flows_bw[0][..., 0:2]
        flow12_2 = flows_fw[2][..., 0:2]
        flow21_2 = flows_bw[2][..., 0:2]

        im1_recons = flow_warp(
            lax.stop_gradient(img2), flow12_0, pad=cfg.warp_pad,
            align_corners=cfg.align_corners,
        )
        if cfg.with_bk:
            im2_recons = flow_warp(
                lax.stop_gradient(img1), flow21_0, pad=cfg.warp_pad,
                align_corners=cfg.align_corners,
            )

        bmask1 = border_mask(flow12_0)
        if cfg.with_bk:
            bmask2 = border_mask(flow21_0)

        if cfg.occ_type == "wang":
            occu_mask1 = 1.0 - get_occu_mask_backward(flow21_0, th=cfg.wang_thr)
            occu_mask2 = 1.0 - get_occu_mask_backward(flow12_0, th=cfg.wang_thr)
        elif cfg.occ_type == "wang1":
            occu_mask1 = jnp.clip(compute_range_map(flow21_0), 0.0, 1.0)
            occu_mask2 = jnp.clip(compute_range_map(flow12_0), 0.0, 1.0)
        elif cfg.occ_type == "brox":
            occu_mask1 = 1.0 - get_occu_mask_bidirection(flow12_0, flow21_0)
            occu_mask2 = 1.0 - get_occu_mask_bidirection(flow21_0, flow12_0)
        elif cfg.occ_type == "none":
            # NOTE: the reference uses ones_like(flow) — a 2-channel mask that
            # breaks the 3-channel photometric products (fullres_loss.py:77-78);
            # a single-channel all-ones mask is the working semantics.
            occu_mask1 = jnp.ones_like(flow12_0[..., :1])
            occu_mask2 = jnp.ones_like(flow21_0[..., :1])
        else:
            raise NotImplementedError(cfg.occ_type)

        loss_warp = self.loss_photometric(img1, im1_recons, occu_mask1 * bmask1)
        if cfg.with_bk:
            loss_warp = loss_warp + self.loss_photometric(
                img2, im2_recons, occu_mask2 * bmask2
            )

        h, w = flow12_2.shape[1], flow12_2.shape[2]
        im1_2 = resize_bilinear(img1, (h, w), align_corners=cfg.align_corners)
        loss_smooth = self.loss_smooth(flow12_2, lax.stop_gradient(im1_2))
        if cfg.with_bk:
            im2_2 = resize_bilinear(img2, (h, w), align_corners=cfg.align_corners)
            loss_smooth = loss_smooth + self.loss_smooth(
                flow21_2, lax.stop_gradient(im2_2)
            )

        total = loss_warp + cfg.w_smooth * loss_smooth
        return {
            "total": total,
            "l_ph": loss_warp,
            "l_sm": loss_smooth,
            "flow_mean": jnp.mean(
                jnp.abs(jnp.concatenate([flows_fw[0], flows_bw[0]], axis=-1))
            ),
        }
