"""Evaluation metrics.

Depth: abs_rel / sq_rel / RMSE / RMSE_log / delta<1.25^k with masking and
the reference's NaN/Inf-to-0 clamps (reference utils/__init__.py:109-158).
Segmentation: per-class IoU at 0.5 threshold averaged over classes
(reference utils/__init__.py:260-332). Evaluation always re-aligns the
prediction to GT with the closed-form scale/shift first
(utils/__init__.py:219-234).

Metrics are computed in numpy on host (they aggregate over a validation
set, not in the jit hot path); jnp arrays are accepted.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np

from .losses import compute_scale_and_shift


@dataclass
class DepthMetrics:
    abs_rel: float
    sq_rel: float
    rmse: float
    rmse_log: float
    a1: float
    a2: float
    a3: float

    def as_dict(self) -> Dict[str, float]:
        return self.__dict__.copy()


def _clamp(v: float) -> float:
    return 0.0 if (np.isinf(v) or np.isnan(v)) else float(v)


def compute_masked_errors(gt, pred, mask) -> DepthMetrics:
    """Reference compute_masked_errors (utils/__init__.py:109-158)."""
    gt = np.asarray(gt, np.float64)
    pred = np.asarray(pred, np.float64)
    mask = np.asarray(mask, bool)
    g = gt[mask]
    p = pred[mask]

    with np.errstate(divide="ignore", invalid="ignore"):
        thresh = np.maximum(g / p, p / g)
        a1 = _clamp((thresh < 1.25).mean()) if g.size else 0.0
        a2 = _clamp((thresh < 1.25**2).mean()) if g.size else 0.0
        a3 = _clamp((thresh < 1.25**3).mean()) if g.size else 0.0
        rmse = _clamp(np.sqrt(((g - p) ** 2).mean())) if g.size else 0.0
        rmse_log = (
            _clamp(np.sqrt(((np.log(g) - np.log(p)) ** 2).mean()))
            if g.size
            else 0.0
        )
        abs_rel = _clamp(np.mean(np.abs(g - p) / g)) if g.size else 0.0
        sq_rel = _clamp(np.mean(((g - p) ** 2) / g)) if g.size else 0.0
    return DepthMetrics(abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3)


def ssi_aligned_depth_metrics(gt, pred, mask) -> DepthMetrics:
    """Align pred to gt with closed-form scale/shift, then score
    (reference utils/__init__.py:219-234)."""
    import jax.numpy as jnp

    scale, shift = compute_scale_and_shift(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)
    )
    pred_ssi = (
        np.asarray(scale)[:, None, None] * np.asarray(pred)
        + np.asarray(shift)[:, None, None]
    )
    return compute_masked_errors(gt, pred_ssi, mask)


def seg_iou(gt, pred, threshold: float = 0.5) -> float:
    """Class-averaged IoU on (B, C, H, W) mask probabilities
    (reference utils/__init__.py:309-332)."""
    gt = np.asarray(gt)
    pred = np.asarray(pred)
    num_classes = pred.shape[1]
    iou = np.zeros((gt.shape[0],), np.float64)
    for c in range(num_classes):
        pm = pred[:, c] > threshold
        gm = gt[:, c] > threshold
        inter = np.logical_and(pm, gm).sum(axis=(1, 2))
        union = np.logical_or(pm, gm).sum(axis=(1, 2))
        iou += inter / (union + 1e-7)
    return float(np.mean(iou / num_classes))


def occupancy_iou(gt_grid, pred_grid, threshold: float = 0.5) -> float:
    """3D occupancy IoU over (B, gx, gy, gz, C) grids. The reference
    hardcodes this to 0.0 with a TODO (utils/__init__.py:504); implemented
    for real here."""
    gt = np.asarray(gt_grid) > threshold
    pred = np.asarray(pred_grid) > threshold
    inter = np.logical_and(gt, pred).sum()
    union = np.logical_or(gt, pred).sum()
    return float(inter / (union + 1e-7))
