"""Pallas TPU kernels: fused DPT FeatureFusionBlock.

A fusion block (models/dpt.py, reference blocks.py:419-497) is

    s   = path + RCU1(skip)            # skip branch
    m   = RCU2(s)                      # second residual conv unit
    u   = upsample2x(m)                # bilinear align_corners=True
    out = conv1x1(u)

XLA materializes every intermediate in HBM (7 tensors per block). Here
two kernels cover the block:

* ``fused_rcu_add``  — s = base + conv2(relu(conv1(relu(skip)))), the
  skip branch (a generalization of ops/fused_rcu.py).
* ``fused_rcu_tail`` — out_conv(upsample2x(s + RCU(s))): conv pair,
  residual add, the exact align-corners 2x interpolation (computed
  in-kernel from closed-form per-row weights — out[2k] =
  mid[k] + a_k (mid[k-1]-mid[k]), out[2k+1] = mid[k] + b_k
  (mid[k+1]-mid[k]) with a_k = k/(2H-1), b_k = (H-1-k)/(2H-1)), and the
  1x1 out conv, all VMEM-resident.

Only the final output and ``s`` touch HBM. Used for the inference fast
path when the block has no BN and upsamples exactly 2x; the XLA path
remains the reference implementation (parity tests pin them together).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_taps(h, w_ref, rows, cols, C):
    """Sum of 9 shifted matmuls over a (rows+2, cols+2) input value.
    Returns (rows*cols, C) f32."""
    acc = jnp.zeros((rows * cols, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = h[dy : dy + rows, dx : dx + cols, :].reshape(rows * cols, C)
            acc += jax.lax.dot_general(
                patch,
                w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _inside_mask(i, j, TH, TW, H, W, rows, cols, halo):
    """(rows, cols, 1) bool: does mid element (local) fall inside the
    image? local row r corresponds to global i*TH - halo + r."""
    row_g = i * TH - halo + jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    col_g = j * TW - halo + jax.lax.broadcasted_iota(jnp.int32, (1, cols, 1), 1)
    return (row_g >= 0) & (row_g < H) & (col_g >= 0) & (col_g < W)


def _rcu_tail_kernel(
    s_hbm,  # (B, H+8, W+8, C) padded by (3 left, 5 right)
    w1_ref, b1_ref, w2_ref, b2_ref,  # rcu weights (9,C,C)/(1,C)
    wo_ref, bo_ref,  # out conv 1x1: (C, C)/(1, C)
    out_ref,  # (1, 2TH, 2TW, C)
    scratch_s,  # (TH+8, TW+8, C)
    sem,
    *,
    TH: int, TW: int, C: int, H: int, W: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    copy = pltpu.make_async_copy(
        s_hbm.at[b, pl.ds(i * TH, TH + 8), pl.ds(j * TW, TW + 8), :],
        scratch_s,
        sem,
    )
    copy.start()
    copy.wait()

    # s tile with halo 3 (local index 0 = global i*TH - 3)
    s = scratch_s[:]
    h = jnp.maximum(s, 0.0)

    # conv1 over mid1 region (TH+4, TW+4): local offset 1 (halo 2 left)
    r1, c1 = TH + 4, TW + 4
    mid1 = _conv3x3_taps(h, w1_ref, r1, c1, C)
    mid1 += b1_ref[0].astype(jnp.float32)
    mid1 = jnp.maximum(mid1, 0.0).astype(s.dtype).reshape(r1, c1, C)
    # zero outside-image values (conv2's zero padding semantics)
    mid1 = jnp.where(
        _inside_mask(i, j, TH, TW, H, W, r1, c1, 2),
        mid1,
        jnp.zeros_like(mid1),
    )

    # conv2 over mid2 region (TH+2, TW+2): rcu output + residual s
    r2, c2 = TH + 2, TW + 2
    rcu = _conv3x3_taps(mid1, w2_ref, r2, c2, C)
    rcu += b2_ref[0].astype(jnp.float32)
    s_mid = s[2 : 2 + r2, 2 : 2 + c2, :].astype(jnp.float32)
    mid = (rcu.reshape(r2, c2, C) + s_mid).astype(s.dtype)
    # mid local index 0 = global i*TH - 1 (halo 1 for the upsample);
    # outside-image mid values must not leak into edge interpolation —
    # the closed-form weights are zero there (a_0 = 0, b_{H-1} = 0), so
    # garbage is annihilated; no masking needed.

    # --- align-corners 2x upsample along H then W ------------------
    # out[2k]   = mid[k] + a_k (mid[k-1] - mid[k]),  a_k = k / (2H-1)
    # out[2k+1] = mid[k] + b_k (mid[k+1] - mid[k]),  b_k = (H-1-k)/(2H-1)
    k_row = i * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, 1, 1), 0)
    a_r = (k_row.astype(jnp.float32) / (2 * H - 1)).astype(s.dtype)
    b_r = ((H - 1 - k_row).astype(jnp.float32) / (2 * H - 1)).astype(s.dtype)
    cur = mid[1 : 1 + TH]  # rows k
    prv = mid[0:TH]  # rows k-1
    nxt = mid[2 : 2 + TH]  # rows k+1
    even = cur + a_r * (prv - cur)  # (TH, TW+2, C)
    odd = cur + b_r * (nxt - cur)
    up_h = jnp.stack([even, odd], axis=1).reshape(2 * TH, c2, C)

    k_col = j * TW + jax.lax.broadcasted_iota(jnp.int32, (1, TW, 1), 1)
    a_c = (k_col.astype(jnp.float32) / (2 * W - 1)).astype(s.dtype)
    b_c = ((W - 1 - k_col).astype(jnp.float32) / (2 * W - 1)).astype(s.dtype)
    cur = up_h[:, 1 : 1 + TW]
    prv = up_h[:, 0:TW]
    nxt = up_h[:, 2 : 2 + TW]
    even = cur + a_c * (prv - cur)
    odd = cur + b_c * (nxt - cur)
    up = jnp.stack([even, odd], axis=2).reshape(2 * TH, 2 * TW, C)

    # --- 1x1 out conv ----------------------------------------------
    flat = up.reshape(4 * TH * TW, C)
    out = jax.lax.dot_general(
        flat, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out += bo_ref[0].astype(jnp.float32)
    out_ref[0] = out.reshape(2 * TH, 2 * TW, C).astype(out_ref.dtype)


def fused_rcu_tail(
    s: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    out_w: jnp.ndarray, out_b: jnp.ndarray,
    tile: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """out_conv(upsample2x_ac(s + RCU(s))).

    s: (B, H, W, C); w: (3, 3, C, C); out_w: (1, 1, C, C) or (C, C).
    Returns (B, 2H, 2W, C).
    """
    B, H, W, C = s.shape
    if tile is None:
        tile = (min(8, H), min(64, W))
    TH, TW = tile
    assert H % TH == 0 and W % TW == 0, (H, W, tile)

    s_pad = jnp.pad(s, ((0, 0), (3, 5), (3, 5), (0, 0)))
    w1r = w1.reshape(9, C, C).astype(s.dtype)
    w2r = w2.reshape(9, C, C).astype(s.dtype)
    wor = out_w.reshape(C, C).astype(s.dtype)
    b1r = b1.reshape(1, C).astype(jnp.float32)
    b2r = b2.reshape(1, C).astype(jnp.float32)
    bor = out_b.reshape(1, C).astype(jnp.float32)

    grid = (B, H // TH, W // TW)
    kernel = functools.partial(
        _rcu_tail_kernel, TH=TH, TW=TW, C=C, H=H, W=W
    )
    n_tiles = B * (H // TH) * (W // TW)
    flops = n_tiles * (
        2 * 9 * C * C * ((TH + 4) * (TW + 4) + (TH + 2) * (TW + 2))
        + 2 * C * C * 4 * TH * TW
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * TH, 2 * TW, C),
            lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, C), s.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, TW + 8, C), s.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=s.size * 2 + B * 4 * H * W * C * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(s_pad, w1r, b1r, w2r, b2r, wor, bor)


def xla_fusion_tail(s, w1, b1, w2, b2, out_w, out_b):
    """XLA reference for the fused tail (same math as models/dpt.py)."""
    from .fused_rcu import xla_rcu
    from .resize import upsample2x_hw

    m = xla_rcu(s, w1, b1, w2, b2)
    u = upsample2x_hw(m, "bilinear", align_corners=True)
    C = s.shape[-1]
    y = jax.lax.conv_general_dilated(
        u, out_w.reshape(1, 1, C, C).astype(u.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + out_b.astype(u.dtype)
    return y
