"""Depth -> point cloud -> semantic occupancy grid, fully inside XLA.

TPU-native rebuild of the reference's geometry path
(reference SOccDPT.py:264-463 and the GT pipeline bdd_helper.py:289-362):
vectorized unprojection with explicit coordinate axes, and voxelization
as a single batched ``scatter-add`` — exact and deterministic, fixing two
reference defects documented in SURVEY.md §2.6:

* the reference's model-path scatter drops the batch pairing and uses
  non-accumulating ``+=`` (SOccDPT.py:449-455); here every batch row
  scatters into its own grid with true accumulation (the semantics of the
  GT path's ``np.add.at``, bdd_helper.py:335-337);
* the reference scales ``points_3D[:, 0..2]`` — the first three *points*
  rather than the x/y/z coordinates (SOccDPT.py:351-353); here pc_scale /
  pc_shift are applied per coordinate as intended.
"""
from __future__ import annotations

import math

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CameraConfig, OccupancyConfig
from .resize import resize_nchw


def rotation_matrix(
    angles_deg: Tuple[float, float, float], transpose: bool = False
) -> np.ndarray:
    """Combined rotation R = Ra @ Rb @ Rc about x, y, z (degrees).

    The reference applies ``points @ R`` in the model path
    (SOccDPT.py:114-128, einsum 'bnm,mj') but ``points @ R.T`` in the GT
    pipeline (bdd_helper.py:648-650) — opposite rotations. ``transpose``
    selects the GT convention.
    """
    a, b, c = (math.radians(v) for v in angles_deg)
    ra = np.array(
        [
            [1, 0, 0],
            [0, math.cos(a), -math.sin(a)],
            [0, math.sin(a), math.cos(a)],
        ]
    )
    rb = np.array(
        [
            [math.cos(b), 0, math.sin(b)],
            [0, 1, 0],
            [-math.sin(b), 0, math.cos(b)],
        ]
    )
    rc = np.array(
        [
            [math.cos(c), -math.sin(c), 0],
            [math.sin(c), math.cos(c), 0],
            [0, 0, 1],
        ]
    )
    m = ra @ rb @ rc
    if transpose:
        m = ra.T @ rb.T @ rc.T
    return m.astype(np.float32)


def rotate_points(
    points: jnp.ndarray,
    angles_deg: Tuple[float, float, float],
    transpose: bool = False,
) -> jnp.ndarray:
    """Rotate (..., 3) points by euler angles (degrees)."""
    m = jnp.asarray(rotation_matrix(angles_deg, transpose), points.dtype)
    return points @ m


def unproject_depth(
    depth: jnp.ndarray, camera: CameraConfig
) -> jnp.ndarray:
    """Pinhole unprojection: (B, H, W) depth -> (B, H, W, 3) camera-frame
    points, X=(V-cx)Z/fx, Y=(U-cy)Z/fy (reference SOccDPT.py:300-316)."""
    B, H, W = depth.shape
    u = jnp.arange(H, dtype=depth.dtype)[:, None]  # rows
    v = jnp.arange(W, dtype=depth.dtype)[None, :]  # cols
    x = (v - camera.cx) * depth / camera.fx
    y = (u - camera.cy) * depth / camera.fy
    return jnp.stack([x, y, depth], axis=-1)


def points_to_occupancy_grid(
    points: jnp.ndarray,
    semantics: jnp.ndarray,
    occ: OccupancyConfig,
    num_classes: int,
    mode: str = "prob",
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Voxelize semantic points into a per-batch occupancy grid.

    points: (B, N, 3) in meters; semantics: (B, N, C) class scores.
    Returns (B, gx, gy, gz, C) accumulated counts/weights.

    mode="prob"  — scatter-add class probabilities (differentiable w.r.t.
                   semantics; replaces the reference's ``nonzero`` +
                   non-accumulating ``+=`` at SOccDPT.py:440-455).
    mode="count" — scatter-add 1 where score > threshold (GT semantics,
                   bdd_helper.py:335-337).
    """
    B, N, _ = points.shape
    gx, gy, gz = occ.grid_size
    shape_m = jnp.asarray(occ.occupancy_shape, points.dtype)
    grid = jnp.asarray(occ.grid_size, points.dtype)

    finite = jnp.all(jnp.isfinite(points), axis=-1)
    safe_points = jnp.where(finite[..., None], points, 0.0)
    ijk_f = safe_points / shape_m * grid
    ijk = ijk_f.astype(jnp.int32)
    # Reference in-bounds test is strict 0 < idx < grid (SOccDPT.py:424-427).
    inb = jnp.all((ijk > 0) & (ijk < jnp.asarray(occ.grid_size)), axis=-1)
    valid = finite & inb

    lin = (ijk[..., 0] * gy + ijk[..., 1]) * gz + ijk[..., 2]  # (B, N)
    lin = jnp.where(valid, lin, gx * gy * gz)  # OOB rows -> dropped

    if mode == "prob":
        vals = semantics
    elif mode == "count":
        vals = (semantics > threshold).astype(points.dtype)
    else:
        raise ValueError(mode)
    vals = vals * valid[..., None].astype(points.dtype)

    def scatter_one(lin_b, vals_b):
        flat = jnp.zeros((gx * gy * gz, num_classes), vals_b.dtype)
        flat = flat.at[lin_b].add(vals_b, mode="drop")
        return flat.reshape(gx, gy, gz, num_classes)

    return jax.vmap(scatter_one)(lin, vals)


def get_semantic_occupancy(
    inv_depth: jnp.ndarray,
    segmentation: jnp.ndarray,
    camera: CameraConfig,
    occ: OccupancyConfig,
    num_classes: int,
    compute_occ: bool = False,
    occ_mode: str = "prob",
    output_size: Optional[Tuple[int, int]] = None,
):
    """Reference ``SOccDPT.get_semantic_occupancy`` (SOccDPT.py:264-372),
    vectorized and jit-friendly.

    inv_depth: (B, h, w); segmentation: (B, C, h, w) class probabilities.
    Returns (inv_depth_up, seg_up, points, occupancy_grid_or_None) with
    inv_depth_up (B, H, W), seg_up (B, C, H, W), points (B, H, W, 3)
    where (H, W) is the camera resolution (or ``output_size``).
    """
    H, W = output_size if output_size is not None else (camera.height, camera.width)

    inv_depth_up = resize_nchw(
        inv_depth, (H, W), "bicubic", align_corners=False
    )
    seg_up = resize_nchw(segmentation, (H, W), "nearest")

    depth = 1.0 / jnp.maximum(inv_depth_up, 1e-8)

    # Scale pixel coords so intrinsics stay valid at reduced output_size.
    cam = camera
    if (H, W) != (camera.height, camera.width):
        sy, sx = H / camera.height, W / camera.width
        cam = CameraConfig(
            fx=camera.fx * sx,
            fy=camera.fy * sy,
            cx=camera.cx * sx,
            cy=camera.cy * sy,
            width=W,
            height=H,
        )

    points = unproject_depth(depth, cam)  # (B, H, W, 3)

    occupancy_grid = None
    if compute_occ:
        pts = points.reshape(points.shape[0], -1, 3)
        scale = jnp.asarray(occ.pc_scale, pts.dtype)
        shift = jnp.asarray(occ.pc_shift, pts.dtype)
        pts = pts * scale + shift
        pts = rotate_points(pts, occ.correction_angle)
        sem = seg_up.reshape(seg_up.shape[0], num_classes, -1).transpose(0, 2, 1)
        occupancy_grid = points_to_occupancy_grid(
            pts, sem, occ, num_classes, mode=occ_mode
        )

    return inv_depth_up, seg_up, points, occupancy_grid


def occupancy_grid_to_points(
    occupancy_grid: np.ndarray,
    occ: OccupancyConfig,
    threshold: float = 0.5,
) -> np.ndarray:
    """Host-side: (gx, gy, gz, C) grid -> (N, 4) [x, y, z, class_id] points
    in meters (reference utils/__init__.py:532-568)."""
    occupancy_grid = np.asarray(occupancy_grid)
    num_classes = occupancy_grid.shape[3]
    shape_m = np.asarray(occ.occupancy_shape, np.float32)
    grid = np.asarray(occ.grid_size, np.float32)
    idx = np.argwhere(occupancy_grid >= threshold)
    out = []
    for c in range(num_classes):
        ci = idx[idx[:, 3] == c][:, :3]
        pts = (ci / grid * shape_m).astype(np.float32)
        out.append(
            np.concatenate([pts, np.full((len(pts), 1), c, np.float32)], axis=1)
        )
    return (
        np.concatenate(out, axis=0)
        if out
        else np.zeros((0, 4), np.float32)
    )
