"""Visualization artifacts (SURVEY.md §5.5).

Reference equivalents: colormapped disparity + class-color segmentation
side-by-sides (reference utils/__init__.py:646-708, eval_SOccDPT.py:
175-244), height-colored point clouds (color_by_index,
utils/__init__.py:347-371), occupancy-grid point export.
Pure numpy + matplotlib colormaps; cv2 only for resize/imwrite.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _colormap(values01: np.ndarray, name: str = "plasma") -> np.ndarray:
    import matplotlib as mpl

    cmap = mpl.colormaps[name]
    return (cmap(np.clip(values01, 0.0, 1.0))[..., :3] * 255).astype(np.uint8)


def colorize_disparity(disp: np.ndarray, cmap: str = "plasma") -> np.ndarray:
    """(H, W) -> (H, W, 3) uint8, min-max normalized (reference
    utils/__init__.py:649-655)."""
    lo, hi = float(np.min(disp)), float(np.max(disp))
    norm = (disp - lo) / (hi - lo) if hi > lo else np.zeros_like(disp)
    return _colormap(norm, cmap)


def color_segmentation(
    masks: np.ndarray, class_2_color: Dict[int, Tuple[int, int, int]],
    threshold: float = 0.5,
) -> np.ndarray:
    """(C, H, W) probabilities -> (H, W, 3) uint8 class colors
    (reference utils/__init__.py:35-43)."""
    C, H, W = masks.shape
    img = np.zeros((H, W, 3), np.uint8)
    for c in range(C):
        img[masks[c] > threshold] = class_2_color[c]
    return img


def side_by_side(*imgs: np.ndarray, axis: int = 1) -> np.ndarray:
    """Concat images, resizing to the first one's shape."""
    import cv2

    base = imgs[0]
    out = [base]
    for im in imgs[1:]:
        if im.shape[:2] != base.shape[:2]:
            im = cv2.resize(im, (base.shape[1], base.shape[0]))
        out.append(im)
    return np.concatenate(out, axis=axis)


def eval_panel(
    rgb: np.ndarray,
    disp_pred: np.ndarray,
    disp_gt: Optional[np.ndarray],
    seg_pred: np.ndarray,
    seg_gt: Optional[np.ndarray],
    class_2_color: Dict[int, Tuple[int, int, int]],
) -> np.ndarray:
    """RGB | pred disp | gt disp  over  RGB | pred seg | gt seg
    (reference utils/__init__.py:646-708)."""
    row1 = [rgb, colorize_disparity(disp_pred)]
    if disp_gt is not None:
        row1.append(colorize_disparity(disp_gt))
    row2 = [rgb, color_segmentation(seg_pred, class_2_color)]
    if seg_gt is not None:
        row2.append(color_segmentation(seg_gt, class_2_color))
    return np.concatenate(
        [side_by_side(*row1), side_by_side(*row2)], axis=0
    )


def color_by_height(
    points: np.ndarray, index: int = 2, invert: bool = False, cmap: str = "viridis"
) -> np.ndarray:
    """(N, 3) points -> (N, 3) uint8 colors by one coordinate
    (reference color_by_index, utils/__init__.py:347-371)."""
    if len(points) == 0:
        return np.zeros((0, 3), np.uint8)
    h = points[:, index].astype(np.float64)
    finite = np.isfinite(h)
    lo = h[finite].min() if finite.any() else 0.0
    hi = h[finite].max() if finite.any() else 1.0
    norm = (h - lo) / (hi - lo) if hi > lo else np.zeros_like(h)
    if invert:
        norm = 1.0 - norm
    return _colormap(np.clip(norm, 0, 1), cmap)


def semantic_points_to_colors(
    semantic_pc: np.ndarray, class_2_color: Dict[int, Tuple[int, int, int]]
) -> Tuple[np.ndarray, np.ndarray]:
    """(N, 4) [x,y,z,class] -> (points (N,3), colors (N,3))
    (reference bdd_helper.py:577-601)."""
    pts = semantic_pc[:, :3]
    colors = np.asarray(
        [class_2_color[int(c)] for c in semantic_pc[:, 3]], np.uint8
    ) if len(semantic_pc) else np.zeros((0, 3), np.uint8)
    return pts, colors


def save_image(path: str, img: np.ndarray) -> None:
    import cv2
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, img[..., ::-1])  # RGB -> BGR for cv2
