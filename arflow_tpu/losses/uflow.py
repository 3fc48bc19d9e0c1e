"""UFlow loss: census photometric at full res + edge-aware smoothness at 1/4.

Reference: losses/uflow_loss.py:8-109. Occlusion masks are computed from the
range map at level 2 and upsampled (computing them on bilinear-upsampled flow
produces artifacts — uflow_loss.py:39-41).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from arflow_tpu.ops import (
    census_loss,
    compute_range_map,
    downsample,
    flow_to_warp,
    image_grads,
    mask_invalid,
    resample,
    robust_l1,
    upsample,
)


class UFlowLoss:
    """cfg: w_census, w_smooth, smooth_order (1|2), edge_constant, with_bk."""

    def __init__(self, cfg):
        self.cfg = cfg

    def _smooth_one_direction(self, im_2, flow_2):
        cfg = self.cfg
        stride = 2 if cfg.smooth_order == 2 else 1
        im_gx, im_gy = image_grads(lax.stop_gradient(im_2), stride=stride)
        weights_x = jnp.exp(
            -jnp.mean(jnp.abs(cfg.edge_constant * im_gx), axis=-1, keepdims=True)
        )
        weights_y = jnp.exp(
            -jnp.mean(jnp.abs(cfg.edge_constant * im_gy), axis=-1, keepdims=True)
        )
        flow_gx, flow_gy = image_grads(flow_2)
        if cfg.smooth_order == 1:
            tx, ty = flow_gx, flow_gy
        elif cfg.smooth_order == 2:
            tx, _ = image_grads(flow_gx)
            _, ty = image_grads(flow_gy)
        else:
            raise NotImplementedError(f"smooth_order {cfg.smooth_order}")
        return cfg.w_smooth * (
            jnp.mean(weights_x * robust_l1(tx**2))
            + jnp.mean(weights_y * robust_l1(ty**2))
        ) / 2.0

    def __call__(self, res_dict, img1, img2):
        cfg = self.cfg
        flows_fw, flows_bw = res_dict["flows_fw"], res_dict["flows_bw"]
        flow12_0 = flows_fw[0][..., 0:2]
        flow21_0 = flows_bw[0][..., 0:2]
        flow12_2 = flows_fw[2][..., 0:2]
        flow21_2 = flows_bw[2][..., 0:2]

        # Warp images at full resolution.
        warp12_0 = flow_to_warp(flow12_0)
        im1_recons = resample(lax.stop_gradient(img2), warp12_0)

        valid_mask1 = mask_invalid(warp12_0)
        occu_mask1 = jnp.clip(compute_range_map(flow21_2), 0.0, 1.0)
        occu_mask1 = upsample(occu_mask1, is_flow=False, scale_factor=4.0)
        mask1 = lax.stop_gradient(occu_mask1 * valid_mask1)

        loss_warp = cfg.w_census * census_loss(img1, im1_recons, mask1)

        if cfg.with_bk:
            warp21_0 = flow_to_warp(flow21_0)
            im2_recons = resample(lax.stop_gradient(img1), warp21_0)
            valid_mask2 = mask_invalid(warp21_0)
            occu_mask2 = jnp.clip(compute_range_map(flow12_2), 0.0, 1.0)
            occu_mask2 = upsample(occu_mask2, is_flow=False, scale_factor=4.0)
            mask2 = lax.stop_gradient(occu_mask2 * valid_mask2)
            loss_warp = loss_warp + cfg.w_census * census_loss(img2, im2_recons, mask2)

        # Smoothness at level 2.
        im1_2 = downsample(img1, is_flow=False, scale_factor=4.0)
        loss_smooth = self._smooth_one_direction(im1_2, flow12_2)
        if cfg.with_bk:
            im2_2 = downsample(img2, is_flow=False, scale_factor=4.0)
            loss_smooth = loss_smooth + self._smooth_one_direction(im2_2, flow21_2)

        total = loss_warp + loss_smooth
        flow_mean = jnp.mean(
            jnp.abs(jnp.concatenate([flows_fw[0], flows_bw[0]], axis=-1))
        )
        return {
            "total": total,
            "l_ph": loss_warp,
            "l_sm": loss_smooth,
            "flow_mean": flow_mean,
            "mask1": mask1,
        }
