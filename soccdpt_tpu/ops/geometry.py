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

from functools import partial
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


def _segment_sums_sorted(
    lin_s: jnp.ndarray, vals_s: jnp.ndarray, num_cells: int
) -> jnp.ndarray:
    """Per-cell sums from rows SORTED by cell id — no scatter.

    A segmented inclusive scan (``lax.associative_scan`` with a
    reset-at-segment-boundary add) accumulates each cell's rows; the
    cell total is the scan value at each segment's LAST row. That row's
    index is found with a width-1 scatter-max (6.7 ns/row on v5e —
    scripts/scatter_lab4.py; ``searchsorted`` over num_cells queries
    measures 150 ns/query and is avoided) and fetched with one fast
    row gather. Sums are segment-local, so (unlike a
    cumsum-and-difference route) no precision is lost to a 2M-row
    running total.

    lin_s: (N,) int32 ascending, cell ids; rows >= num_cells are dropped.
    vals_s: (N, C). Returns (num_cells, C).
    """
    N = lin_s.shape[0]
    flags = jnp.concatenate(
        [jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]]
    )

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, vb + jnp.where(fb[..., None], 0.0, va)

    _, scan_vals = jax.lax.associative_scan(comb, (flags, vals_s), axis=0)

    # ends[g] = 1 + index of the last sorted row in cell g, 0 if empty.
    row_no = jnp.arange(1, N + 1, dtype=jnp.int32)
    ends = (
        jnp.zeros((num_cells,), jnp.int32)
        .at[lin_s]
        .max(row_no, mode="drop")
    )
    last = jnp.clip(ends - 1, 0, N - 1)
    gathered = jnp.take(scan_vals, last, axis=0)
    return jnp.where((ends > 0)[:, None], gathered, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _accumulate_sort(
    lin: jnp.ndarray,
    vals: jnp.ndarray,
    num_slots: int,
    impl: str = "xla",
    sort_segments: int = 1,
    transposed: bool = False,
):
    """sum_n vals[n] into slot lin[n] (rows with lin >= num_slots drop),
    via a 1-D sort + segment reduction — NEVER under vmap: a batched
    lax.sort lowers ~8x slower on TPU even at batch 1
    (scripts/scatter_lab5.py), so callers fold any batch axis into the
    key and flatten.

    ``sort_segments = B``: when the key is batch-folded (slice b of
    ``lin`` holds only keys in [b*cells, (b+1)*cells)), the flat sort
    splits into B independent smaller sorts whose concatenation is
    already globally sorted — the sort is the super-linear term, so
    this restores linear batch scaling. Dropped rows must then carry an
    in-slice key with zeroed payload (voxelize routes them to the
    batch's own cell 0, which in-bounds points can never hit).

    impl="pallas" uses the MXU one-hot merge-schedule kernel
    (ops/sorted_segment_sum.py — 16 ms for the 2M x (2M, 3) problem on
    v5e vs 83 ms for the XLA scatter); "xla" is the pure-XLA segmented
    scan. Custom VJP: the true gradient of a scatter-add w.r.t.
    ``vals`` is a plain gather of the cotangent at each row's slot —
    cheap and exact — so the backward never differentiates through the
    sort.

    ``transposed=True`` returns (C, num_slots) — the Pallas kernel's
    NATIVE channel-minor layout, skipping its final (num_slots, C)
    transpose whose minor-3 retile cost ~3 ms/step downstream in the
    occ-train profile (consumers that want the folded grid layout take
    this and transpose once, fused with their own cast)."""
    if impl == "pallas":
        from .sorted_segment_sum import segment_sum_sorted_pallas

        return segment_sum_sorted_pallas(
            lin, vals, num_slots, sort_segments=sort_segments,
            transposed=transposed,
        )
    C = vals.shape[-1]
    N = lin.shape[0]
    cols = tuple(vals[:, i] for i in range(C))
    if sort_segments > 1 and N % sort_segments == 0:
        n_seg = N // sort_segments
        parts = [
            jax.lax.sort(
                (lin[b * n_seg : (b + 1) * n_seg],)
                + tuple(c[b * n_seg : (b + 1) * n_seg] for c in cols),
                dimension=0,
                num_keys=1,
            )
            for b in range(sort_segments)
        ]
        lin_s = jnp.concatenate([p[0] for p in parts])
        vals_s = jnp.stack(
            [jnp.concatenate([p[i] for p in parts]) for i in range(1, 1 + C)],
            axis=-1,
        )
    else:
        sorted_ops = jax.lax.sort((lin,) + cols, dimension=0, num_keys=1)
        lin_s = sorted_ops[0]
        vals_s = jnp.stack(sorted_ops[1:], axis=-1)
    out = _segment_sums_sorted(lin_s, vals_s, num_slots)
    return out.T if transposed else out


def _accumulate_sort_fwd(lin, vals, num_slots, impl, sort_segments, transposed):
    return (
        _accumulate_sort(lin, vals, num_slots, impl, sort_segments, transposed),
        lin,
    )


def _accumulate_sort_bwd(num_slots, impl, sort_segments, transposed, lin, cot):
    valid = lin < num_slots
    safe = jnp.clip(lin, 0, num_slots - 1)
    taken = (
        jnp.take(cot, safe, axis=1).T if transposed
        else jnp.take(cot, safe, axis=0)
    )
    grad_vals = jnp.where(valid[:, None], taken, 0.0)
    return np.zeros(lin.shape, jax.dtypes.float0), grad_vals


_accumulate_sort.defvjp(_accumulate_sort_fwd, _accumulate_sort_bwd)


def points_to_occupancy_grid(
    points: jnp.ndarray,
    semantics: jnp.ndarray,
    occ: OccupancyConfig,
    num_classes: int,
    mode: str = "prob",
    threshold: float = 0.5,
    method: str = "auto",
    layout: str = "grid5d",
) -> jnp.ndarray:
    """Voxelize semantic points into a per-batch occupancy grid.

    points: (B, N, 3) in meters; semantics: (B, N, C) class scores.
    Returns (B, gx, gy, gz, C) accumulated counts/weights — or, with
    layout="folded_cz", the depth-folded (B, gx, gy, C*gz) view (channel
    index c*gz + z) that the real OccupancyHead consumes directly: the
    sort/pallas routes then hand over the kernel's native channel-minor
    buffer with ONE fused transpose instead of materializing the 5-D
    minor-3 tensor (~3 ms/step of relayout in the occ-train profile).

    mode="prob"  — accumulate class probabilities (differentiable w.r.t.
                   semantics; replaces the reference's ``nonzero`` +
                   non-accumulating ``+=`` at SOccDPT.py:440-455).
    mode="count" — accumulate 1 where score > threshold (GT semantics,
                   bdd_helper.py:335-337).

    method selects the accumulation algorithm (all numerically
    equivalent vs the np.add.at oracle, tests/test_geometry.py):

    "scatter" — one batched width-C ``scatter-add``. On TPU v5e XLA
                lowers this to a ~40 ns/row serial loop at C=3
                (scripts/scatter_lab3.py) — 83 ms for a 2M-point cloud.
    "pallas"  — sort rows by cell id (1-D lax.sort, 3.6 ms at 2M), then
                the MXU one-hot merge-schedule kernel
                (ops/sorted_segment_sum.py): 16 ms total, 5.1x the XLA
                scatter, bit-consistent with it to f32 rounding.
    "sort"    — sort + pure-XLA segmented scan + scatter-max/gather
                (44.8 ms at 2M; the no-Pallas fallback).
    "auto"    — "pallas" for large point clouds on TPU, "scatter"
                otherwise (small N: the sort routes' fixed costs
                dominate; CPU scatters are fine).
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
    num_cells = gx * gy * gz
    lin = jnp.where(valid, lin, num_cells)  # OOB rows -> dropped

    if mode == "prob":
        vals = semantics
    elif mode == "count":
        vals = (semantics > threshold).astype(points.dtype)
    else:
        raise ValueError(mode)
    vals = vals * valid[..., None].astype(points.dtype)

    if method == "auto":
        on_tpu = jax.default_backend() == "tpu"
        method = "pallas" if (on_tpu and N >= 16384) else "scatter"

    if layout not in ("grid5d", "folded_cz"):
        raise ValueError(layout)
    if method == "scatter":

        def scatter_one(lin_b, vals_b):
            flat = jnp.zeros((num_cells, num_classes), vals_b.dtype)
            flat = flat.at[lin_b].add(vals_b, mode="drop")
            return flat.reshape(gx, gy, gz, num_classes)

        grid5 = jax.vmap(scatter_one)(lin, vals)
        if layout == "folded_cz":
            return grid5.transpose(0, 1, 2, 4, 3).reshape(
                B, gx, gy, num_classes * gz
            )
        return grid5

    if method not in ("sort", "pallas"):
        raise ValueError(method)

    # Fold the batch into the key (slot = b*num_cells + cell): a
    # vmapped/batched sort is ~8x slower on TPU even at B=1
    # (scripts/scatter_lab5.py); instead the flat key sorts as B
    # independent per-batch 1-D sorts (sort_segments=B) whose
    # concatenation is already globally sorted — the B=4 occ contract
    # scaled SUPER-linearly with one flat 8.3M-row sort (62 img/s < the
    # 69.6 of batch 1). B*num_cells must stay in int32.
    if B * (num_cells + 1) >= 2**31:
        raise ValueError(
            f"batch {B} x grid {num_cells} overflows the int32 sort key"
        )
    batch_off = jnp.arange(B, dtype=jnp.int32)[:, None] * num_cells
    # dropped rows -> the batch's own cell 0 (zero payload; in-bounds
    # points can never hit cell 0 since the reference's bounds test is
    # strict ijk > 0) — keeps every slice's keys in-range so the
    # per-batch sorted runs concatenate globally sorted.
    flat_lin = (jnp.where(lin == num_cells, 0, lin) + batch_off).reshape(-1)
    flat_vals = vals.reshape(B * N, num_classes)
    impl = "pallas" if method == "pallas" else "xla"
    if layout == "folded_cz":
        # kernel-native (C, B*cells) buffer; one transpose lands it in
        # the depth-folded channel order c*gz + z the head consumes
        flat_t = _accumulate_sort(
            flat_lin, flat_vals, B * num_cells, impl, B, True
        )
        return (
            flat_t.reshape(num_classes, B, gx, gy, gz)
            .transpose(1, 2, 3, 0, 4)
            .reshape(B, gx, gy, num_classes * gz)
        )
    flat = _accumulate_sort(
        flat_lin, flat_vals, B * num_cells, impl, B
    )
    return flat.reshape(B, gx, gy, gz, num_classes)


def get_semantic_occupancy(
    inv_depth: jnp.ndarray,
    segmentation: jnp.ndarray,
    camera: CameraConfig,
    occ: OccupancyConfig,
    num_classes: int,
    compute_occ: bool = False,
    occ_mode: str = "prob",
    output_size: Optional[Tuple[int, int]] = None,
    grid_layout: str = "grid5d",
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
            pts, sem, occ, num_classes, mode=occ_mode, layout=grid_layout
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
