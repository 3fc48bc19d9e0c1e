"""Pyramid ELBO loss ("elbo" type): unflow loss with per-level diagonal
Gaussian reparametrization and an entropy bonus.

Reference: losses/elbo_loss.py:10-146 (whose CUDA-only Normal hack at :13-15
crashes on CPU — here sampling is an explicit keyed draw, which also runs
anywhere).

Per-level flow tensors carry [flow_fw(2), log_var_fw(2), flow_bw(2),
log_var_bw(2)] channels (from PWCLiteProb).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arflow_tpu.losses.unflow import UnFlowLoss, _resize_nearest
from arflow_tpu.ops import (
    flow_warp,
    get_occu_mask_backward,
    get_occu_mask_bidirection,
    resize_area,
)


class ElboLoss(UnFlowLoss):
    """cfg adds: w_entropy, w_en_scales."""

    def __call__(self, res_dict, img1, img2, rng=None, noise=None):
        cfg = self.cfg
        pyramid_flows = [
            jnp.concatenate([fw, bw], axis=-1)
            for fw, bw in zip(res_dict["flows_fw"], res_dict["flows_bw"])
        ]
        warp_losses, smooth_losses, entropies = [], [], []
        occu1_l0 = occu2_l0 = None

        if noise is None:
            if rng is None:
                raise ValueError("ElboLoss needs rng (or injected noise)")
            keys = jax.random.split(rng, 2 * len(pyramid_flows))

        s = 1.0
        for i, flow in enumerate(pyramid_flows):
            if cfg.w_scales[i] == 0:
                warp_losses.append(0.0)
                smooth_losses.append(0.0)
                continue
            h, w = flow.shape[1], flow.shape[2]
            im1_scaled = resize_area(img1, (h, w))
            im2_scaled = resize_area(img2, (h, w))

            mean_fw, log_var_fw = flow[..., 0:2], flow[..., 2:4]
            mean_bw, log_var_bw = flow[..., 4:6], flow[..., 6:8]
            if noise is not None:
                eps_fw, eps_bw = noise[f"eps_fw_{i}"], noise[f"eps_bw_{i}"]
            else:
                eps_fw = jax.random.normal(keys[2 * i], mean_fw.shape, flow.dtype)
                eps_bw = jax.random.normal(keys[2 * i + 1], mean_bw.shape, flow.dtype)
            flow_sample_fw = mean_fw + jnp.exp(log_var_fw / 2.0) * eps_fw
            flow_sample_bw = mean_bw + jnp.exp(log_var_bw / 2.0) * eps_bw

            im1_recons = flow_warp(im2_scaled, flow_sample_fw, pad=cfg.warp_pad)
            im2_recons = flow_warp(im1_scaled, flow_sample_bw, pad=cfg.warp_pad)

            if i == 0:
                if cfg.get("occ_from_back", False):
                    occu_mask1 = 1.0 - get_occu_mask_backward(flow_sample_bw, th=0.2)
                    occu_mask2 = 1.0 - get_occu_mask_backward(flow_sample_fw, th=0.2)
                else:
                    occu_mask1 = 1.0 - get_occu_mask_bidirection(
                        flow_sample_fw, flow_sample_bw
                    )
                    occu_mask2 = 1.0 - get_occu_mask_bidirection(
                        flow_sample_bw, flow_sample_fw
                    )
                occu1_l0, occu2_l0 = occu_mask1, occu_mask2
                s = min(h, w)
            else:
                occu_mask1 = _resize_nearest(occu1_l0, (h, w))
                occu_mask2 = _resize_nearest(occu2_l0, (h, w))

            loss_warp = self.loss_photometric(im1_scaled, im1_recons, occu_mask1)
            loss_smooth = self.loss_smooth(flow_sample_fw / s, im1_scaled)
            entropy = jnp.mean(jnp.sum(log_var_fw, axis=-1)) / 2.0
            if cfg.with_bk:
                loss_warp = (
                    loss_warp + self.loss_photometric(im2_scaled, im2_recons, occu_mask2)
                ) / 2.0
                loss_smooth = (
                    loss_smooth + self.loss_smooth(flow_sample_bw / s, im2_scaled)
                ) / 2.0
                entropy = (entropy + jnp.mean(jnp.sum(log_var_bw, axis=-1)) / 2.0) / 2.0
            warp_losses.append(loss_warp)
            smooth_losses.append(loss_smooth)
            entropies.append(entropy)

        warp_loss = sum(l * w for l, w in zip(warp_losses, cfg.w_scales))
        smooth_loss = cfg.w_smooth * sum(
            l * w for l, w in zip(smooth_losses, cfg.w_sm_scales)
        )
        entropy = cfg.w_entropy * sum(
            l * w for l, w in zip(entropies, cfg.w_en_scales)
        )
        total = warp_loss + smooth_loss - entropy
        return {
            "total": total,
            "l_ph": warp_loss,
            "l_sm": smooth_loss,
            "entropy": entropy,
            "flow_mean": jnp.mean(jnp.abs(pyramid_flows[0])),
        }
