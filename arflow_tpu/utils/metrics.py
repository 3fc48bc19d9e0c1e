"""Flow accuracy and uncertainty metrics (host-side numpy).

Reference: utils/flow_utils.py:121-320 — EPE / E_noc / E_occ / F1_all,
soft-threshold sparsification plots + AUC vs oracle, calibration curves.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np


def _resize_bilinear_np(img: np.ndarray, out_hw) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(
            img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR
        )
    except ImportError:  # pragma: no cover
        from arflow_tpu.ops.resize import _resize_matrix

        mh = _resize_matrix(img.shape[0], out_hw[0], "bilinear", False)
        mw = _resize_matrix(img.shape[1], out_hw[1], "bilinear", False)
        return np.einsum("oh,hwc->owc", mh, np.einsum("ow,hwc->hoc", mw, img))


def _rescale_pred(pred_flow: np.ndarray, out_hw) -> np.ndarray:
    """Scale flow values & resample to GT resolution (flow_utils.py:130-140)."""
    hh, ww = out_hw
    h, w = pred_flow.shape[:2]
    pred = pred_flow.copy()
    pred[:, :, 0] *= ww / w
    pred[:, :, 1] *= hh / h
    if (h, w) != (hh, ww):
        pred = _resize_bilinear_np(pred, out_hw)
    return pred


def evaluate_flow(gt_flows, pred_flows):
    """Mean EPE; with KITTI masks also E_noc, E_occ, F1_all
    (utils/flow_utils.py:121-183). gt (H,W,2|4); pred (h,w,2)."""

    def error_rate(epe_map, gt_flow, mask):
        bad = np.logical_and(
            epe_map * mask > 3,
            epe_map
            * mask
            / np.maximum(np.sqrt(np.sum(np.square(gt_flow), axis=2)), 1e-10)
            > 0.05,
        )
        return bad.sum() / max(mask.sum(), 1e-10) * 100.0

    error = error_noc = error_occ = f1 = 0.0
    b = len(gt_flows)
    with_masks = gt_flows[0].shape[-1] == 4
    for gt, pred in zip(gt_flows, pred_flows):
        hh, ww = gt.shape[:2]
        pred = _rescale_pred(pred[:, :, :2], (hh, ww))
        epe_map = np.sqrt(np.sum(np.square(pred - gt[:, :, :2]), axis=2))
        if not with_masks:
            error += np.mean(epe_map)
        else:
            occ_mask = gt[:, :, 2]
            noc_mask = gt[:, :, 3]
            error += np.sum(epe_map * occ_mask) / max(np.sum(occ_mask), 1.0)
            error_noc += np.sum(epe_map * noc_mask) / max(np.sum(noc_mask), 1.0)
            error_occ += np.sum(epe_map * (occ_mask - noc_mask)) / max(
                np.sum(occ_mask - noc_mask), 1.0
            )
            f1 += error_rate(epe_map, gt[:, :, :2], occ_mask)
    if with_masks:
        return [error / b, error_noc / b, error_occ / b, f1 / b]
    return [error / b]


def sp_plot(error, entropy, gt_mask, n: int = 25, alpha: float = 100.0, eps: float = 1e-1):
    """Soft-threshold sparsification plot (utils/flow_utils.py:186-227)."""
    from scipy.special import expit

    def sp_mask(thr):
        mask = expit(alpha * (thr[:, None, None] - entropy[None, :, :]))
        frac = np.sum((1.0 - mask) * gt_mask[None], axis=(1, 2)) / np.sum(gt_mask)
        return mask * gt_mask[None], frac

    greatest = np.max(entropy) + eps
    least = np.min(entropy) - eps
    _, frac = sp_mask(np.array([least]))
    while abs(frac.item() - 1.0) > eps:
        least -= 1e-3 * (greatest - least)
        _, frac = sp_mask(np.array([least]))
    _, frac = sp_mask(np.array([greatest]))
    while abs(frac.item() - 0.0) > eps:
        greatest += 1e-3 * (greatest - least)
        _, frac = sp_mask(np.array([greatest]))

    grid_entr = np.linspace(greatest, least, n)
    grid_frac = np.linspace(0, 1, n)
    mask, frac = sp_mask(grid_entr)
    for _ in range(10):
        if np.max(np.abs(frac - grid_frac)) <= eps:
            break
        grid_entr = np.interp(grid_frac, frac, grid_entr)
        mask, frac = sp_mask(grid_entr)
    if np.max(np.abs(frac - grid_frac)) > eps:
        print("Warning! sp_plot did not converge!")

    splot = np.sum(error[None, :, :] * mask, axis=(1, 2)) / np.sum(mask, axis=(1, 2))
    return np.interp(grid_frac, frac, splot)


def evaluate_uncertainty(gt_flows, pred_flows, pred_entropies, sp_samples: int = 25):
    """AUC of the sparsification plot vs its oracle
    (utils/flow_utils.py:281-320). Entropies are per-pixel 2-channel log-std
    maps; rescaling adds log-resolution corrections."""
    auc, oracle_auc = 0.0, 0.0
    splots, oracle_splots = [], []
    b = len(gt_flows)
    for gt, pred, ent in zip(gt_flows, pred_flows, pred_entropies):
        hh, ww = gt.shape[:2]
        h, w = pred.shape[:2]
        pred = _rescale_pred(pred[:, :, :2], (hh, ww))
        ent = ent.copy()
        ent[:, :, 0] += -2 * math.log(w) + 2 * math.log(ww)
        ent[:, :, 1] += -2 * math.log(h) + 2 * math.log(hh)
        if (h, w) != (hh, ww):
            ent = _resize_bilinear_np(ent, (hh, ww))

        epe_map = np.sqrt(np.sum(np.square(pred - gt[:, :, :2]), axis=2))
        mask = gt[:, :, 2] if gt.shape[2] >= 4 else np.ones_like(epe_map)
        entropy_map = np.sum(ent[:, :, :2], axis=2)
        splot = sp_plot(epe_map, entropy_map, mask, n=sp_samples)
        oracle = sp_plot(epe_map, epe_map, mask, n=sp_samples)
        splots.append(splot)
        oracle_splots.append(oracle)
        frac = np.linspace(0, 1, sp_samples)
        auc += np.trapezoid(splot / splot[0], x=frac)
        oracle_auc += np.trapezoid(oracle / oracle[0], x=frac)
    return [auc / b, (auc - oracle_auc) / b], splots, oracle_splots


class CalibrationCurve:
    """Binned |error| vs predicted sigma (utils/flow_utils.py:230-277)."""

    def __init__(self, cc_max: float = 3.5, cc_samples: int = 100):
        self.cc_max = cc_max
        self.cc_samples = cc_samples
        self.errors = defaultdict(list)
        self.bins = np.linspace(0, cc_max, cc_samples)

    def __call__(self, gt_flows, pred_flows, pred_entropies):
        for gt, pred, ent in zip(gt_flows, pred_flows, pred_entropies):
            sigma = np.exp(ent)
            bin_idx = np.digitize(sigma, self.bins)
            hh, ww = gt.shape[:2]
            pred = _rescale_pred(pred[:, :, :2], (hh, ww))
            error = np.abs(pred - gt[:, :, :2])
            for idx in range(self.cc_samples + 1):
                self.errors[idx].extend(error[bin_idx == idx].reshape(-1))

    def calibration_curve(self):
        vals, means, sigmas, numbers = [], [], [], []
        for idx in range(self.cc_samples + 1):
            numbers.append(len(self.errors[idx]))
            vals.append((idx + 0.5) * self.cc_max / (self.cc_samples - 1))
            if self.errors[idx]:
                means.append(float(np.mean(self.errors[idx])))
                sigmas.append(float(np.std(self.errors[idx])))
            else:
                means.append(float("nan"))
                sigmas.append(float("nan"))
        return vals, means, sigmas, numbers
