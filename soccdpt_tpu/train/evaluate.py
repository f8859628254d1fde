"""Validation-set evaluation (reference utils/__init__.py:161-332, 598-765).

Computes the reference's metrics with the reference's protocol:
predictions resized (bicubic, align_corners=False) to GT resolution,
depth re-aligned per image with the closed-form scale/shift before
scoring, per-class IoU at 0.5 threshold. Visual artifacts (colormapped
side-by-sides, point clouds) are produced by utils/visualize.py and are
optional — the metric path has no plotting dependencies.
"""
from __future__ import annotations


from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_nchw
from .metrics import occupancy_iou, seg_iou, ssi_aligned_depth_metrics


from functools import partial


@partial(jax.jit, static_argnums=0)
def _eval_forward(model, v, image):
    # Module-level jit with the (hashable) flax module as a static arg:
    # repeated make_eval_forward calls across eval rounds hit the same
    # compiled executable instead of re-tracing a fresh closure.
    return model.apply(v, image, deterministic=True, return_raw=True)


def make_eval_forward(model, variables) -> Callable:
    """Jitted deterministic forward returning raw (inv_depth, seg).

    The weight tree is bound as a jit *argument* (one explicit transfer
    up front), not a closure: closed-over host trees are shipped with
    the module at compile time, which overflows the remote-compile
    transport for 200M+ param models (see utils/timing.py). Param-
    derived attention biases are folded once on the first call
    (models/bias_cache.py) — weights are fixed during evaluation, and
    the bias gathers otherwise dominate per-batch dispatch latency.
    """
    from ..models.bias_cache import build_inference_cache

    variables = jax.device_put(variables)
    bound = {}

    def run(image):
        if "v" not in bound:
            bound["v"] = build_inference_cache(
                model, variables, image, deterministic=True, return_raw=True
            )
        return _eval_forward(model, bound["v"], image)

    return run


def evaluate_depth_seg(
    forward: Callable,
    batches,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Aggregate depth metrics + seg IoU over an iterable of batches."""
    depth_sums: Dict[str, list] = {}
    ious = []
    n = 0
    for batch in batches:
        if max_batches is not None and n >= max_batches:
            break
        inv_depth, seg = forward(jnp.asarray(batch["image"]))
        gt_disp = np.asarray(batch["disparity"], np.float32)
        gt_seg = np.asarray(batch["seg"], np.float32)
        mask = np.asarray(batch["mask_disp"], bool)
        gt_hw = gt_disp.shape[-2:]

        disp_pred = np.asarray(
            resize_nchw(inv_depth.astype(jnp.float32), gt_hw, "bicubic", False)
        )
        seg_pred = np.asarray(
            resize_nchw(seg.astype(jnp.float32), gt_hw, "bicubic", False)
        )

        m = ssi_aligned_depth_metrics(gt_disp, disp_pred, mask)
        for k, v in m.as_dict().items():
            depth_sums.setdefault(k, []).append(v)
        ious.append(seg_iou(gt_seg, seg_pred))
        n += 1

    out = {k: float(np.mean(v)) for k, v in depth_sums.items()}
    out["iou"] = float(np.mean(ious)) if ious else 0.0
    return out


def evaluate_occupancy(
    forward_occ: Callable,
    batches,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Occupancy-grid IoU (reference leaves this as a 0.0 TODO at
    utils/__init__.py:504; real here)."""
    ious = []
    n = 0
    for batch in batches:
        if max_batches is not None and n >= max_batches:
            break
        grid_pred = forward_occ(jnp.asarray(batch["image"]))
        ious.append(
            occupancy_iou(np.asarray(batch["occupancy_grid"]), np.asarray(grid_pred))
        )
        n += 1
    return {"iou_3D": float(np.mean(ious)) if ious else 0.0}
