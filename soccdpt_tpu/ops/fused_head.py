"""Pallas TPU kernel: fused DPT depth-head tail.

The depth head (models/heads.py, reference dpt.py:199-219) ends with

    u = upsample2x(x)          # bilinear align_corners=True, (2H, 2W, Ci)
    y = relu(conv3x3(u))       # Ci -> Cm (128 -> 32 at the flagship)
    z = relu(conv1x1(y))       # Cm -> 1 inverse depth

XLA materializes ``u`` (16.8 MB at the flagship) and spends ~100 us of
layout formatting around the 32-channel conv (PERF.md round-2 profile).
This kernel keeps the whole tail in VMEM per output tile: the exact
align-corners interpolation is computed in-kernel from closed-form
per-row weights (same scheme as ops/fused_fusion.py), the 3x3 conv is
a sum of 9 shifted matmuls, and only the input tile (with 1-px halo)
and the 1-channel output touch HBM.

Derivation of the tile upsample (rows; columns identical): the conv at
out rows [2iT, 2iT+2T-1] needs up rows o in [2iT-1, 2iT+2T] —
o = 2k   -> mid[k] + a_k (mid[k-1] - mid[k]),  a_k = k/(2H-1), k in [iT, iT+T]
o = 2k+1 -> mid[k] + b_k (mid[k+1] - mid[k]),  b_k = (H-1-k)/(2H-1),
                                               k in [iT-1, iT+T-1]
Both need mid rows [iT-1, iT+T] — a 1-px halo. Interleaved as
odd[0], even[0], odd[1], even[1], ... (odd[m] at k=iT-1+m, even[m] at
k=iT+m) this is exactly the 2T+2 rows in order. Out-of-image rows/cols
(o = -1 at the left image edge, o = 2H at the right) are zeroed by the
inside-image mask before the conv, matching zero padding; for interior
edge rows a_0 = 0 / b_{H-1} = 0 annihilate out-of-range mid values.

Trainable via custom VJP (XLA-recompute backward).
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_fusion import _inside_mask


def _conv3x3_taps_io(h, w_ref, rows, cols, Ci, Co):
    """Sum of 9 shifted matmuls; h (rows+2, cols+2, Ci), w (9, Ci, Co).
    Returns (rows*cols, Co) f32 (generalizes fused_fusion._conv3x3_taps
    to Ci != Co)."""
    acc = jnp.zeros((rows * cols, Co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = h[dy : dy + rows, dx : dx + cols, :].reshape(
                rows * cols, Ci
            )
            acc += jax.lax.dot_general(
                patch,
                w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _up2x_rows(mid, k0, T, n_cols, C, full):
    """(2T+2, n_cols, C) out rows [2*k0-1, 2*k0+2T] per the module
    docstring derivation.

    mid: (T+2, n_cols, C) rows [k0-1, k0+T]; full = image size H (or W).
    """
    dt = mid.dtype
    m_odd = k0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (T + 1, 1, 1), 0)
    m_even = k0 + jax.lax.broadcasted_iota(jnp.int32, (T + 1, 1, 1), 0)
    b_k = ((full - 1 - m_odd).astype(jnp.float32) / (2 * full - 1)).astype(dt)
    a_k = (m_even.astype(jnp.float32) / (2 * full - 1)).astype(dt)
    odd = mid[0 : T + 1] + b_k * (mid[1 : T + 2] - mid[0 : T + 1])
    even = mid[1 : T + 2] + a_k * (mid[0 : T + 1] - mid[1 : T + 2])
    return jnp.stack([odd, even], axis=1).reshape(2 * (T + 1), n_cols, C)


def _up2x_cols(mid, k0, T, n_rows, C, full):
    """Column analog of _up2x_rows: mid (n_rows, T+2, C) ->
    (n_rows, 2T+2, C), no transposes (Mosaic-friendly)."""
    dt = mid.dtype
    m_odd = k0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, T + 1, 1), 1)
    m_even = k0 + jax.lax.broadcasted_iota(jnp.int32, (1, T + 1, 1), 1)
    b_k = ((full - 1 - m_odd).astype(jnp.float32) / (2 * full - 1)).astype(dt)
    a_k = (m_even.astype(jnp.float32) / (2 * full - 1)).astype(dt)
    odd = mid[:, 0 : T + 1] + b_k * (mid[:, 1 : T + 2] - mid[:, 0 : T + 1])
    even = mid[:, 1 : T + 2] + a_k * (mid[:, 0 : T + 1] - mid[:, 1 : T + 2])
    return jnp.stack([odd, even], axis=2).reshape(n_rows, 2 * (T + 1), C)


def _head_tail_kernel(
    x_hbm,  # (B, H+8, W+8, Ci) padded by (1 left, 7 right) — the
    # scratch tile's second-minor dim must be a multiple of 8 or the
    # Mosaic AOT compile crashes (empirically bisected; the working
    # fused_fusion kernel uses the same 8-aligned halo)
    w2_ref, b2_ref,  # conv3x3 (9, Ci, Cm) / (1, Cm)
    w3_ref, b3_ref,  # conv1x1 (1, Cm) / (1, 1) — see w3r/b3r in
    # _fused_head_tail_fwd; the single output channel rides the
    # sublane, not a lane-padded tile
    out_ref,  # (1, 2TH, 2TW)
    scratch_x,  # (TH+8, TW+8, Ci)
    sem,
    *,
    TH: int, TW: int, Ci: int, Cm: int, H: int, W: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TH, TH + 8), pl.ds(j * TW, TW + 8), :],
        scratch_x,
        sem,
    )
    copy.start()
    copy.wait()

    # mid rows/cols [i*TH-1, i*TH+TH] x [j*TW-1, j*TW+TW] (halo 1; the
    # extra 2-px right halo from the padded layout is unused).
    mid = scratch_x[0 : TH + 2, 0 : TW + 2, :]

    up_h = _up2x_rows(mid, i * TH, TH, TW + 2, Ci, H)  # (2TH+2, TW+2, C)
    up = _up2x_cols(up_h, j * TW, TW, 2 * TH + 2, Ci, W)
    # up: (2TH+2, 2TW+2, C) = out rows/cols with halo 1

    # zero out-of-image values (conv zero-padding semantics at out res)
    up = jnp.where(
        _inside_mask(i, j, 2 * TH, 2 * TW, 2 * H, 2 * W,
                     2 * TH + 2, 2 * TW + 2, 1),
        up,
        jnp.zeros_like(up),
    )

    # --- conv3x3 (Ci -> Cm) + relu ---------------------------------
    y = _conv3x3_taps_io(up, w2_ref, 2 * TH, 2 * TW, Ci, Cm)
    y += b2_ref[0].astype(jnp.float32)
    y = jnp.maximum(y, 0.0)

    # --- conv1x1 (Cm -> 1) + relu ----------------------------------
    # Contract the Cm channels against the weight vector broadcast on
    # the lane axis: (2TH, 2TW*? ) Keep it 2D-friendly for Mosaic:
    # y2d (rows*cols, Cm) x w3 (Cm, 2TW)? Simplest supported form — sum
    # over the channel axis of an elementwise product.
    y3 = y.reshape(2 * TH, 2 * TW, Cm)
    w3v = w3_ref[0].astype(jnp.float32)  # (Cm,)
    z = jnp.sum(y3 * w3v[None, None, :], axis=-1)  # (2TH, 2TW)
    z += b3_ref[0, 0].astype(jnp.float32)
    z = jnp.maximum(z, 0.0)
    out_ref[0] = z.astype(out_ref.dtype)


def _fused_head_tail_fwd(
    x: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    tile: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W, Ci = x.shape
    Cm = w2.shape[-1]
    if tile is None:
        tile = (min(8, H), min(64, W))
    TH, TW = tile
    assert H % TH == 0 and W % TW == 0, (H, W, tile)

    x_pad = jnp.pad(x, ((0, 0), (1, 7), (1, 7), (0, 0)))
    w2r = w2.reshape(9, Ci, Cm).astype(x.dtype)
    b2r = b2.reshape(1, Cm).astype(jnp.float32)
    w3r = w3.reshape(1, Cm).astype(jnp.float32)
    b3r = jnp.asarray(b3, jnp.float32).reshape(1, 1)

    grid = (B, H // TH, W // TW)
    kernel = functools.partial(
        _head_tail_kernel, TH=TH, TW=TW, Ci=Ci, Cm=Cm, H=H, W=W
    )
    flops = B * 4 * H * W * (9 * Ci * Cm * 2 + Cm * 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * TH, 2 * TW),
            lambda b, i, j: (b, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, TW + 8, Ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + B * 4 * H * W * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, w2r, b2r, w3r, b3r)


def xla_head_tail(x, w2, b2, w3, b3):
    """XLA reference (same math as models/heads.py DepthHead tail)."""
    from .resize import upsample2x_hw

    Ci, Cm = x.shape[-1], w2.shape[-1]
    u = upsample2x_hw(x, "bilinear", align_corners=True)
    y = jax.lax.conv_general_dilated(
        u, w2.reshape(3, 3, Ci, Cm).astype(u.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2.astype(u.dtype)
    y = jnp.maximum(y, 0.0)
    z = jax.lax.conv_general_dilated(
        y, w3.reshape(1, 1, Cm, 1).astype(y.dtype), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b3, y.dtype).reshape(1)
    z = jnp.maximum(z, 0.0)
    return z[..., 0]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_head_tail_vjp(x, w2, b2, w3, b3, tile, interpret):
    return _fused_head_tail_fwd(x, w2, b2, w3, b3, tile, interpret)


def _fht_fwd(x, w2, b2, w3, b3, tile, interpret):
    out = _fused_head_tail_vjp(x, w2, b2, w3, b3, tile, interpret)
    return out, (x, w2, b2, w3, b3)


def _fht_bwd(tile, interpret, residuals, g):
    x, w2, b2, w3, b3 = residuals
    _, vjp = jax.vjp(
        lambda x_, w2_, b2_, w3_, b3_: xla_head_tail(x_, w2_, b2_, w3_, b3_),
        x, w2, b2, w3, b3,
    )
    return vjp(g.astype(x.dtype))


_fused_head_tail_vjp.defvjp(_fht_fwd, _fht_bwd)


def fused_head_tail(x, w2, b2, w3, b3, tile=None, interpret: bool = False):
    """Differentiable fused head tail: Pallas forward, XLA-recompute
    backward. Returns (B, 2H, 2W)."""
    return _fused_head_tail_vjp(x, w2, b2, w3, b3, tile, interpret)
