"""UFlow ELBO loss — the fork's main probabilistic objective.

Reference: losses/uflow_elbo_loss.py:108-568. The network predicts a
variational posterior over level-2 flow; the loss is a reparametrized
negative ELBO: data term (census/ssim on MC flow samples), smoothness
(closed-form expectation for diagonal posteriors, sampled otherwise),
entropy bonus, plus optional out-of-frame and occlusion penalties.

Posterior approximations (cfg.approx):
  - 'diag'     diagonal Gaussian, covariance or precision (inv_cov) param
  - 'sparse'   triangular Sigma^(1/2) with k-support bands (cov_supp)
  - 'mixture'  K-component Gaussian mixture (optionally learned weights)
  - 'lowrank'  low-rank square root (cfg.columns columns)

JAX-specific: sampling uses explicit PRNG keys (``rng``); parity tests can
inject fixed noise via ``noise=`` (keys: eps12, eps21, z12, z21).

Documented divergences from the reference (latent broadcast bugs there, both
unreachable with shipped configs which use n_samples=1 for these branches):
  - closed-form smoothness weights are computed from the un-tiled images
    (reference tiles images first; broadcast fails for n_samples>1).
  - approx_entropy normalizes by the tiled diag (reference uses un-tiled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from arflow_tpu.losses.blocks import (
    data_loss_no_penalty,
    data_loss_no_penalty_bidir,
    edge_weights,
    smooth_loss_no_penalty,
)
from arflow_tpu.ops import (
    downsample,
    flow_to_warp,
    get_penalty,
    matrix_vector_product_general,
)
from arflow_tpu.utils.gmm import gaussian_mixture_log_pdf


def _tile(x, n):
    """Tile batch n times, samples-major (torch ``x.repeat(n,1,1,1)``)."""
    if n == 1:
        return x
    return jnp.tile(x, (n,) + (1,) * (x.ndim - 1))


class UFlowElboLoss:
    def __init__(self, cfg):
        self.cfg = cfg

    # -- penalties ----------------------------------------------------------
    def _penalty(self, name, kind):
        """kind: 'smooth' or a data-loss name ('census'/'ssim')."""
        if name == "gmm":
            pi = self.cfg.get(f"penalty_{kind}_pi")
            beta = self.cfg.get(f"penalty_{kind}_beta")
            return get_penalty(name, pi=pi, beta=beta)
        return get_penalty(name)

    # -- reparametrizations (uflow_elbo_loss.py:118-188) --------------------
    def _reparam_diag(self, mean, log_diag, eps):
        return mean + jnp.exp(log_diag) * eps

    def _reparam_diag_inv(self, mean, log_diag, eps):
        return mean + jnp.exp(-log_diag) * eps

    def _reparam_triag(self, mean, std_full, eps):
        return mean + matrix_vector_product_general(
            std_full, eps, k=self.cfg.cov_supp
        )

    def _reparam_gmm(self, mean, std, z, eps):
        """mean/std: (B,H,W,2K); z: (B,S) component indices; eps: (S*B,H,W,2)."""
        b, h, w, _ = mean.shape
        s = z.shape[1]

        def select(params, comp):  # comp: (B,) -> (B,H,W,2)
            idx_u = (2 * comp)[:, None, None, None]
            idx_v = (2 * comp + 1)[:, None, None, None]
            pu = jnp.take_along_axis(params, jnp.broadcast_to(idx_u, (b, h, w, 1)), axis=-1)
            pv = jnp.take_along_axis(params, jnp.broadcast_to(idx_v, (b, h, w, 1)), axis=-1)
            return jnp.concatenate([pu, pv], axis=-1)

        # Samples-major stacking: sample s varies slowest (batch fast).
        mean_sel = jnp.concatenate(
            [select(mean, z[:, si]) for si in range(s)], axis=0
        )
        std_sel = jnp.concatenate([select(std, z[:, si]) for si in range(s)], axis=0)
        return mean_sel + std_sel * eps

    def _reparam_lowrank(self, mean, std, eps_cols):
        """std: (S*B,H,W,2C); eps_cols: (S*B,1,1,2C) per-column scalars."""
        eps = std * eps_cols
        eps_u = jnp.sum(eps[..., 0::2], axis=-1, keepdims=True)
        eps_v = jnp.sum(eps[..., 1::2], axis=-1, keepdims=True)
        return mean + jnp.concatenate([eps_u, eps_v], axis=-1)

    # -- main ---------------------------------------------------------------
    def __call__(self, res_dict, im1_0, im2_0, rng=None, noise=None):
        cfg = self.cfg
        n = cfg.n_samples
        out_fw = res_dict["flows_fw"][2]
        out_bw = res_dict["flows_bw"][2]
        b, h2, w2 = out_fw.shape[0], out_fw.shape[1], out_fw.shape[2]

        if noise is None:
            if rng is None:
                raise ValueError("UFlowElboLoss needs rng (or injected noise)")
            noise = {}
            k1, k2, k3, k4 = jax.random.split(rng, 4)
            noise["_keys"] = (k1, k2, k3, k4)

        def normal(name, shape, key):
            if name in noise:
                return noise[name]
            return jax.random.normal(key, shape, dtype=out_fw.dtype)

        loss_offdiag = 0.0
        weights12 = weights21 = None
        z12 = z21 = None

        # -- slice level-2 outputs by approximation (lines 197-246) --------
        if cfg.approx == "diag":
            mean12_2 = out_fw[..., 0:2]
            log_diag12_2 = out_fw[..., 2:4]
            mean21_2 = out_bw[..., 0:2]
            log_diag21_2 = out_bw[..., 2:4]
            diag12_2 = jnp.exp(log_diag12_2)
            diag21_2 = jnp.exp(log_diag21_2)
        elif cfg.approx == "sparse":
            num_offdiag = (cfg.cov_supp + 1) ** 2 - 1
            mean12_2 = out_fw[..., 0:2]
            log_diag12_2 = out_fw[..., 2:4]
            offdiag12_2 = out_fw[..., 4 : 4 + num_offdiag * 2]
            mean21_2 = out_bw[..., 0:2]
            log_diag21_2 = out_bw[..., 2:4]
            offdiag21_2 = out_bw[..., 4 : 4 + num_offdiag * 2]
            diag12_2 = jnp.exp(log_diag12_2)
            diag21_2 = jnp.exp(log_diag21_2)
            full12_2 = jnp.concatenate([diag12_2, offdiag12_2], axis=-1)
            full21_2 = jnp.concatenate([diag21_2, offdiag21_2], axis=-1)
            loss_offdiag = jnp.mean(jnp.square(offdiag12_2))
            if cfg.with_bk:
                loss_offdiag = loss_offdiag + jnp.mean(jnp.square(offdiag21_2))
        elif cfg.approx == "mixture":
            k = cfg.n_components
            mean12_2 = out_fw[..., 0 : 2 * k]
            log_diag12_2 = out_fw[..., 2 * k : 4 * k]
            mean21_2 = out_bw[..., 0 : 2 * k]
            log_diag21_2 = out_bw[..., 2 * k : 4 * k]
            diag12_2 = jnp.exp(log_diag12_2)
            diag21_2 = jnp.exp(log_diag21_2)
            if "weights_fw" in res_dict:
                weights12 = res_dict["weights_fw"]
                weights21 = res_dict["weights_bw"]
            else:
                weights12 = jnp.ones((b, k), out_fw.dtype) / k
                weights21 = jnp.ones((b, k), out_fw.dtype) / k
        elif cfg.approx == "lowrank":
            cols = cfg.columns
            mean12_2 = out_fw[..., 0:2]
            std12_2 = out_fw[..., 2 : 2 + 2 * cols]
            mean21_2 = out_bw[..., 0:2]
            std21_2 = out_bw[..., 2 : 2 + 2 * cols]
        else:
            raise NotImplementedError(cfg.approx)

        if cfg.get("natural_grad", False):
            raise NotImplementedError("Natural gradient is not implemented!")

        # -- reparametrization (lines 292-314) -----------------------------
        keys = noise.get("_keys", (None,) * 4)
        flow_shape = (n * b, h2, w2, 2)
        if cfg.approx == "diag" and not cfg.inv_cov:
            eps12 = normal("eps12", flow_shape, keys[0])
            eps21 = normal("eps21", flow_shape, keys[1])
            flow12_2 = self._reparam_diag(_tile(mean12_2, n), _tile(log_diag12_2, n), eps12)
            flow21_2 = self._reparam_diag(_tile(mean21_2, n), _tile(log_diag21_2, n), eps21)
        elif cfg.approx == "diag" and cfg.inv_cov:
            eps12 = normal("eps12", flow_shape, keys[0])
            eps21 = normal("eps21", flow_shape, keys[1])
            flow12_2 = self._reparam_diag_inv(_tile(mean12_2, n), _tile(log_diag12_2, n), eps12)
            flow21_2 = self._reparam_diag_inv(_tile(mean21_2, n), _tile(log_diag21_2, n), eps21)
        elif cfg.approx == "sparse":
            if cfg.inv_cov:
                raise NotImplementedError(
                    "Sparse precision matrix representation is not implemented!"
                )
            eps12 = normal("eps12", flow_shape, keys[0])
            eps21 = normal("eps21", flow_shape, keys[1])
            flow12_2 = self._reparam_triag(_tile(mean12_2, n), _tile(full12_2, n), eps12)
            flow21_2 = self._reparam_triag(_tile(mean21_2, n), _tile(full21_2, n), eps21)
        elif cfg.approx == "mixture":
            if cfg.inv_cov:
                raise NotImplementedError(
                    "Inverse covariance parametrization is not implemented for "
                    "mixture variational approximation."
                )
            eps12 = normal("eps12", flow_shape, keys[0])
            eps21 = normal("eps21", flow_shape, keys[1])
            if "z12" in noise:
                z12, z21 = noise["z12"], noise["z21"]
            else:
                z12 = jax.random.categorical(
                    keys[2], jnp.log(weights12), shape=(n, b)
                ).T
                z21 = jax.random.categorical(
                    keys[3], jnp.log(weights21), shape=(n, b)
                ).T
            flow12_2 = self._reparam_gmm(mean12_2, diag12_2, z12, eps12)
            flow21_2 = self._reparam_gmm(mean21_2, diag21_2, z21, eps21)
        elif cfg.approx == "lowrank":
            cols_shape = (n * b, 1, 1, 2 * cfg.columns)
            eps12 = normal("eps12", cols_shape, keys[0])
            eps21 = normal("eps21", cols_shape, keys[1])
            flow12_2 = self._reparam_lowrank(_tile(mean12_2, n), _tile(std12_2, n), eps12)
            flow21_2 = self._reparam_lowrank(_tile(mean21_2, n), _tile(std21_2, n), eps21)

        # -- tile images / means for MC samples (lines 316-321) ------------
        im1_orig, im2_orig = im1_0, im2_0
        im1_0 = _tile(im1_0, n)
        im2_0 = _tile(im2_0, n)
        mean12_2_rep = _tile(mean12_2, n)
        mean21_2_rep = _tile(mean21_2, n)

        # -- entropy (lines 323-381) ---------------------------------------
        w_ent = cfg.w_entropy
        if cfg.approx == "diag" and not cfg.inv_cov:
            if cfg.get("approx_entropy", False):
                tmp12 = (flow12_2 - lax.stop_gradient(mean12_2_rep)) / lax.stop_gradient(
                    _tile(diag12_2, n)
                )
                loss_entropy = w_ent * jnp.mean(jnp.sum(tmp12 * tmp12 / 2, axis=-1))
                if cfg.with_bk:
                    tmp21 = (flow21_2 - lax.stop_gradient(mean21_2_rep)) / lax.stop_gradient(
                        _tile(diag21_2, n)
                    )
                    loss_entropy = loss_entropy + w_ent * jnp.mean(
                        jnp.sum(tmp21 * tmp21 / 2, axis=-1)
                    )
            else:
                loss_entropy = w_ent * jnp.mean(jnp.sum(log_diag12_2, axis=-1))
                if cfg.with_bk:
                    loss_entropy = loss_entropy + w_ent * jnp.mean(
                        jnp.sum(log_diag21_2, axis=-1)
                    )
        elif cfg.approx == "diag" and cfg.inv_cov:
            loss_entropy = -w_ent * jnp.mean(jnp.sum(log_diag12_2, axis=-1))
            if cfg.with_bk:
                loss_entropy = loss_entropy - w_ent * jnp.mean(
                    jnp.sum(log_diag21_2, axis=-1)
                )
        elif cfg.approx == "sparse":
            loss_entropy = w_ent * jnp.mean(jnp.sum(log_diag12_2, axis=-1))
            if cfg.with_bk:
                loss_entropy = loss_entropy + w_ent * jnp.mean(
                    jnp.sum(log_diag21_2, axis=-1)
                )
        elif cfg.approx == "mixture":
            loss_entropy = -w_ent * jnp.mean(
                gaussian_mixture_log_pdf(flow12_2, mean12_2, log_diag12_2, weights12)
            )
            if cfg.with_bk:
                loss_entropy = loss_entropy - w_ent * jnp.mean(
                    gaussian_mixture_log_pdf(flow21_2, mean21_2, log_diag21_2, weights21)
                )
        elif cfg.approx == "lowrank":
            loss_entropy = w_ent * jnp.mean(_lowrank_entropy(std12_2))
            if cfg.with_bk:
                loss_entropy = loss_entropy + w_ent * jnp.mean(_lowrank_entropy(std21_2))

        # -- data loss (lines 383-402) --------------------------------------
        data_penalties = [
            self._penalty(name, kind)
            for name, kind in zip(cfg.data_penalty, cfg.data_loss)
        ]
        loss_warp = 0.0
        occu_mask21 = None
        if cfg.with_bk:
            # TPU fast path: both directions ride one batched pipeline
            # (per-direction weight normalization via num_groups=2; the
            # summed penalized 2B batch equals fw_sum + bw_sum). Images and
            # means go in UN-tiled with n_rep=n: the helper gathers each MC
            # sample group from the small source, census-transforms each
            # target once, and broadcasts the sample-independent masks.
            nb = flow12_2.shape[0]
            pl, pw, occu_mask_b, valid_mask_b = data_loss_no_penalty_bidir(
                im1_orig, im2_orig, flow12_2, flow21_2, cfg.occ_type,
                cfg.data_loss, mean12_2, mean21_2, n_rep=n,
                taylor_default=cfg.get("taylor_warp", False),
                z12=z12, z21=z21,
            )
            for pixel_loss, pixel_weight, weight, penalty in zip(
                pl, pw, cfg.data_weight, data_penalties
            ):
                loss_warp = loss_warp + _apply_data_penalty(
                    pixel_loss, pixel_weight, weight, penalty
                )
            if occu_mask_b is not None:
                occu_mask12 = occu_mask_b[:nb]
                occu_mask21 = occu_mask_b[nb:]
            else:
                occu_mask12 = None
            valid_mask12 = valid_mask_b[:nb]
        else:
            pl12, pw12, occu_mask12, valid_mask12 = data_loss_no_penalty(
                im1_0, im2_0, flow12_2, flow21_2, cfg.occ_type, cfg.data_loss,
                mean12_2_rep, mean21_2_rep,
            )
            for pixel_loss, pixel_weight, weight, penalty in zip(
                pl12, pw12, cfg.data_weight, data_penalties
            ):
                loss_warp = loss_warp + _apply_data_penalty(
                    pixel_loss, pixel_weight, weight, penalty
                )

        # -- smoothness (lines 404-533) -------------------------------------
        penalty_smooth = self._penalty(cfg.penalty_smooth, "smooth")
        if cfg.get("closed_form_smooth", False):
            if cfg.approx != "diag":
                raise NotImplementedError(
                    "closed_form_smooth requires diag approximation"
                )
            loss_smooth = self._closed_form_smooth(
                im1_orig, mean12_2, diag12_2, penalty_smooth
            )
            if cfg.with_bk:
                loss_smooth = loss_smooth + self._closed_form_smooth(
                    im2_orig, mean21_2, diag21_2, penalty_smooth
                )
        else:
            loss_smooth = self._sampled_smooth(im1_0, flow12_2, penalty_smooth)
            if cfg.with_bk:
                loss_smooth = loss_smooth + self._sampled_smooth(
                    im2_0, flow21_2, penalty_smooth
                )

        # -- out-of-frame penalty (lines 535-549) ---------------------------
        loss_oof = 0.0
        if cfg.get("w_oof", 0.0) > 0.0:
            loss_oof = cfg.w_oof * _oof_penalty(flow12_2)
            if cfg.with_bk:
                loss_oof = loss_oof + cfg.w_oof * _oof_penalty(flow21_2)

        # -- occlusion penalty (lines 551-560) -------------------------------
        loss_occ = 0.0
        if cfg.get("w_occ", 0.0) > 0.0:

            def occu_penalty(x, alpha=100.0):
                return 1.0 / (alpha * x + 1.0)

            loss_occ = cfg.w_occ * jnp.mean(
                occu_penalty(occu_mask12) * jnp.square(flow12_2)
            )
            if cfg.with_bk:
                loss_occ = loss_occ + cfg.w_occ * jnp.mean(
                    occu_penalty(occu_mask21) * jnp.square(flow21_2)
                )

        total = loss_warp + loss_smooth - loss_entropy + loss_oof + loss_occ
        if cfg.approx == "sparse":
            total = total + cfg.offdiag_reg * loss_offdiag

        return {
            "total": total,
            "l_ph": loss_warp,
            "l_sm": loss_smooth,
            "entropy": loss_entropy,
            "l_oof": loss_oof,
            "flow12_2": flow12_2,
            "occu_mask12": occu_mask12,
            "valid_mask12": valid_mask12,
        }

    # -- smoothness helpers -------------------------------------------------
    def _closed_form_smooth(self, im_0, mean_2, diag_2, penalty_func):
        """Expected smoothness under a diagonal posterior
        (uflow_elbo_loss.py:408-502), orders 1 and 2."""
        cfg = self.cfg
        im_2 = downsample(im_0, is_flow=False, scale_factor=4.0)
        order = cfg.get("order_smooth", 1)
        stride = 2 if order == 2 else 1
        weights_x, weights_y = edge_weights(
            im_2, cfg.edge_constant, cfg.edge_asymp, stride=stride
        )
        if order == 1:
            weights_x = weights_x / 2.0
            weights_y = weights_y / 2.0
            e_x = (
                (mean_2[:, :, 1:, :] - mean_2[:, :, :-1, :]) ** 2
                + diag_2[:, :, 1:, :] ** 2
                + diag_2[:, :, :-1, :] ** 2
            )
            e_y = (
                (mean_2[:, 1:, :, :] - mean_2[:, :-1, :, :]) ** 2
                + diag_2[:, 1:, :, :] ** 2
                + diag_2[:, :-1, :, :] ** 2
            )
        elif order == 2:
            e_x = (
                (mean_2[:, :, :-2, :] - 2 * mean_2[:, :, 1:-1, :] + mean_2[:, :, 2:, :]) ** 2
                + diag_2[:, :, :-2, :] ** 2
                + 4 * diag_2[:, :, 1:-1, :] ** 2
                + diag_2[:, :, 2:, :] ** 2
            )
            e_y = (
                (mean_2[:, :-2, :, :] - 2 * mean_2[:, 1:-1, :, :] + mean_2[:, 2:, :, :]) ** 2
                + diag_2[:, :-2, :, :] ** 2
                + 4 * diag_2[:, 1:-1, :, :] ** 2
                + diag_2[:, 2:, :, :] ** 2
            )
        else:
            raise NotImplementedError(f"order_smooth {order}")

        return self._weighted_smooth_mean(
            weights_x, e_x, penalty_func
        ) + self._weighted_smooth_mean(weights_y, e_y, penalty_func)

    def _sampled_smooth(self, im_0, flow_2, penalty_func):
        """Sampled smoothness (uflow_elbo_loss.py:507-533).

        Note: order 1 on the flow gradients (the reference's sampled branch
        never uses order_smooth 2). AVERAGED over pixels per the uflow recipe.
        """
        cfg = self.cfg
        sx, wx, sy, wy = smooth_loss_no_penalty(
            im_0, flow_2, cfg.edge_constant, cfg.edge_asymp
        )
        sx = sx**2
        sy = sy**2
        return self._weighted_smooth_mean(
            wx, sx, penalty_func
        ) + self._weighted_smooth_mean(wy, sy, penalty_func)

    def _weighted_smooth_mean(self, weights, e, penalty_func):
        """mean(weights * w_smooth * penalty(e)), reproducing the reference's
        isotropic broadcast.

        With isotropic_smooth the reference drops the channel dim without
        keepdim, so torch broadcasts (B,1,H,W') x (B,H,W') to (B,B,H,W') —
        pairing every batch entry's weights with every entry's penalties
        (uflow_elbo_loss.py:419,423). Replicated by default; set
        cfg.fix_isotropic_broadcast for the per-entry pairing instead.
        """
        cfg = self.cfg
        if not cfg.get("isotropic_smooth", False):
            return jnp.mean(weights * cfg.w_smooth * penalty_func(e))
        e_iso = jnp.mean(e, axis=-1)  # (B, H, W')
        q = cfg.w_smooth * penalty_func(e_iso)
        if cfg.get("fix_isotropic_broadcast", False):
            return jnp.mean(weights[..., 0] * q)
        # mean over the (B, B, H, W') cross product == mean_hw(
        #   mean_b weights * mean_b penalties)
        return jnp.mean(
            jnp.mean(weights[..., 0], axis=0) * jnp.mean(q, axis=0)
        )


def _apply_data_penalty(pixel_loss, pixel_weight, weight, penalty):
    if isinstance(pixel_loss, (list, tuple)):
        # ssim_loss returns [d1_sq, d2_sq] (uflow_utils.py:309-334); the
        # reference sums penalty over the list implicitly via torch broadcast
        # of list? No — it passes the list through `penalty(pixel_loss)` which
        # works because ssim is used with the identity/charbonnier penalties
        # elementwise; reproduce by summing the penalized components.
        return sum(
            jnp.sum(pixel_weight * weight * penalty(pl)) for pl in pixel_loss
        )
    return jnp.sum(pixel_weight * weight * penalty(pixel_loss))


def _oof_penalty(flow_2):
    """Quadratic out-of-frame penalty (uflow_elbo_loss.py:535-549)."""
    warp = flow_to_warp(flow_2)
    h, w = flow_2.shape[1], flow_2.shape[2]
    u, v = warp[..., 0], warp[..., 1]
    loss_u = jnp.minimum(u, 0.0) ** 2 + jnp.maximum(u - (w - 1.0), 0.0) ** 2
    loss_v = jnp.minimum(v, 0.0) ** 2 + jnp.maximum(v - (h - 1.0), 0.0) ** 2
    return jnp.mean(loss_u + loss_v)


def _lowrank_entropy(std):
    """Log-det entropy of the low-rank square root via Gram matrices
    (uflow_elbo_loss.py:362-381). std: (B,H,W,2C)."""
    b, h, w, c2 = std.shape
    c = c2 // 2
    hi = lax.Precision.HIGHEST
    std_u = jnp.moveaxis(std[..., 0::2], -1, 1).reshape(b, c, h * w)
    std_v = jnp.moveaxis(std[..., 1::2], -1, 1).reshape(b, c, h * w)
    gram_u = jnp.einsum("bck,bdk->bcd", std_u, std_u, precision=hi)
    gram_v = jnp.einsum("bck,bdk->bcd", std_v, std_v, precision=hi)
    _, logdet_u = jnp.linalg.slogdet(gram_u)
    _, logdet_v = jnp.linalg.slogdet(gram_v)
    return (logdet_u + logdet_v) / (2.0 * h * w)
