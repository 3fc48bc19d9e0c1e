"""ARFlow multi-scale unsupervised loss ("unflow" type).

Reference: losses/flow_loss.py:8-114. Per-level: area-resize images, warp with
the ARFlow grid_sample convention, occlusion from level 0 (bidirectional brox
or backward wang), L1 + SSIM + ternary photometric, edge-aware smoothness on
scale-normalized flow.

Documented divergences:
- the reference passes the (dist, mask) tuple returned by the refactored
  TernaryLoss into arithmetic (losses/flow_loss.py:24-25 vs loss_blocks.py:62)
  — a crash if w_ternary > 0. Here the ternary term uses the distance map
  masked by the census validity mask (the original ARFlow behavior).
- configs with w_scales[0] == 0 crash the reference (flow_loss.py:80-84 reads
  pyramid_occu_mask1[0] which was never appended). Here the level-0 occlusion
  masks (and the flow normalizer s) are computed on demand from
  pyramid_flows[0] even when level 0 itself carries no loss weight; numerics
  are identical for every config the reference can actually run.
"""

from __future__ import annotations

import jax.numpy as jnp

from arflow_tpu.losses.blocks import smooth_grad_1st, smooth_grad_2nd, ternary_loss
from arflow_tpu.ops import (
    flow_warp,
    get_occu_mask_backward,
    get_occu_mask_bidirection,
    resize_area,
    ssim_dist,
)


def _resize_nearest(x, out_hw):
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    iy = (jnp.arange(oh) * h) // oh
    ix = (jnp.arange(ow) * w) // ow
    return x[:, iy][:, :, ix]


class UnFlowLoss:
    """cfg: w_l1, w_ssim, w_ternary, w_scales, w_sm_scales, w_smooth, alpha,
    occ_from_back, smooth_2nd, warp_pad, with_bk."""

    def __init__(self, cfg):
        self.cfg = cfg

    def loss_photometric(self, im_scaled, im_recons, occu_mask):
        cfg = self.cfg
        terms = []
        if cfg.w_l1 > 0:
            terms.append(cfg.w_l1 * jnp.abs(im_scaled - im_recons) * occu_mask)
        if cfg.w_ssim > 0:
            terms.append(
                cfg.w_ssim * ssim_dist(im_recons * occu_mask, im_scaled * occu_mask)
            )
        if cfg.w_ternary > 0:
            dist, valid = ternary_loss(im_recons * occu_mask, im_scaled * occu_mask)
            terms.append(cfg.w_ternary * dist * valid)
        return sum(jnp.mean(t) for t in terms) / jnp.mean(occu_mask)

    def loss_smooth(self, flow, im_scaled):
        if self.cfg.get("smooth_2nd", False):
            return smooth_grad_2nd(flow, im_scaled, self.cfg.alpha)
        return smooth_grad_1st(flow, im_scaled, self.cfg.alpha)

    def _occu_masks_l0(self, flow0):
        """Level-0 occlusion masks (reference flow_loss.py:71-78)."""
        if self.cfg.get("occ_from_back", False):
            m1 = 1.0 - get_occu_mask_backward(flow0[..., 2:], th=0.2)
            m2 = 1.0 - get_occu_mask_backward(flow0[..., :2], th=0.2)
        else:
            m1 = 1.0 - get_occu_mask_bidirection(flow0[..., :2], flow0[..., 2:])
            m2 = 1.0 - get_occu_mask_bidirection(flow0[..., 2:], flow0[..., :2])
        return m1, m2

    def __call__(self, res_dict, img1, img2):
        cfg = self.cfg
        pyramid_flows = [
            jnp.concatenate([fw, bw], axis=-1)
            for fw, bw in zip(res_dict["flows_fw"], res_dict["flows_bw"])
        ]
        warp_losses = []
        smooth_losses = []
        occu1_l0 = occu2_l0 = None

        s = 1.0
        for i, flow in enumerate(pyramid_flows):
            if cfg.w_scales[i] == 0:
                warp_losses.append(0.0)
                smooth_losses.append(0.0)
                continue
            h, w = flow.shape[1], flow.shape[2]
            im1_scaled = resize_area(img1, (h, w))
            im2_scaled = resize_area(img2, (h, w))
            im1_recons = flow_warp(im2_scaled, flow[..., :2], pad=cfg.warp_pad)
            im2_recons = flow_warp(im1_scaled, flow[..., 2:], pad=cfg.warp_pad)

            if occu1_l0 is None:
                # Always derived from the level-0 flow, even when level 0
                # itself carries no loss weight (where the reference crashes;
                # see the module docstring).
                occu1_l0, occu2_l0 = self._occu_masks_l0(pyramid_flows[0])
                f0 = pyramid_flows[0]
                s = min(f0.shape[1], f0.shape[2])
            if i == 0:
                occu_mask1, occu_mask2 = occu1_l0, occu2_l0
            else:
                occu_mask1 = _resize_nearest(occu1_l0, (h, w))
                occu_mask2 = _resize_nearest(occu2_l0, (h, w))

            loss_warp = self.loss_photometric(im1_scaled, im1_recons, occu_mask1)
            loss_smooth = self.loss_smooth(flow[..., :2] / s, im1_scaled)
            if cfg.with_bk:
                loss_warp = (
                    loss_warp + self.loss_photometric(im2_scaled, im2_recons, occu_mask2)
                ) / 2.0
                loss_smooth = (
                    loss_smooth + self.loss_smooth(flow[..., 2:] / s, im2_scaled)
                ) / 2.0
            warp_losses.append(loss_warp)
            smooth_losses.append(loss_smooth)

        warp_loss = sum(l * w for l, w in zip(warp_losses, cfg.w_scales))
        smooth_loss = cfg.w_smooth * sum(
            l * w for l, w in zip(smooth_losses, cfg.w_sm_scales)
        )
        total = warp_loss + smooth_loss
        return {
            "total": total,
            "l_ph": warp_loss,
            "l_sm": smooth_loss,
            "flow_mean": jnp.mean(jnp.abs(pyramid_flows[0])),
        }
