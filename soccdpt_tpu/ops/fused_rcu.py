"""Pallas TPU kernel: fused ResidualConvUnit (relu-conv3x3-relu-conv3x3
+ skip) for the DPT decoder.

The decoder dominates inference time (PERF.md: 98% of the forward at
batch 1) and is HBM-bound: XLA materializes every conv's output. This
kernel keeps the intermediate activation of the RCU's first conv in
VMEM: for each spatial tile it DMAs an input tile with a 2-px halo from
a (pre-padded) HBM buffer, computes both 3x3 convs as 9-tap matmul
accumulations on the MXU, adds the residual, and writes only the final
tile — halving the RCU's HBM traffic.

Matches models/dpt.py::ResidualConvUnit (reference blocks.py:348-416)
with use_bn=False (the flagship configuration; BN variants fall back to
the XLA path).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rcu_kernel(
    x_hbm,  # (B, H+8, W+8, C) in ANY/HBM (pre-padded 2 left / 6 right
    #         so halo DMA slices stay 8-aligned for the Mosaic tiling)
    w1_ref,  # (9, C, C) VMEM
    b1_ref,  # (1, C) VMEM
    w2_ref,  # (9, C, C) VMEM
    b2_ref,  # (1, C) VMEM
    out_ref,  # (1, TH, TW, C) VMEM block
    scratch_x,  # (TH+4, TW+4, C) VMEM
    sem,
    *,
    TH: int,
    TW: int,
    C: int,
    H: int,
    W: int,
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

    x_tile = scratch_x[:]  # (TH+8, TW+8, C); cols/rows beyond +4 unused
    h = jnp.maximum(x_tile, 0.0)

    # conv1 over the (TH+2, TW+2) mid region: 9 shifted matmuls
    mid = jnp.zeros(((TH + 2) * (TW + 2), C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = h[dy : dy + TH + 2, dx : dx + TW + 2, :].reshape(
                (TH + 2) * (TW + 2), C
            )
            mid += jax.lax.dot_general(
                patch,
                w1_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    mid += b1_ref[0].astype(jnp.float32)
    mid = jnp.maximum(mid, 0.0).astype(x_tile.dtype)
    mid = mid.reshape(TH + 2, TW + 2, C)

    # conv2 zero-pads conv1's output at the *image* border: mid rows/cols
    # that fall outside [0, H)x[0, W) must be zero, not the bias+relu of
    # padded input.
    row_g = i * TH - 1 + jax.lax.broadcasted_iota(jnp.int32, (TH + 2, 1, 1), 0)
    col_g = j * TW - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, TW + 2, 1), 1)
    inside = (
        (row_g >= 0) & (row_g < H) & (col_g >= 0) & (col_g < W)
    )
    mid = jnp.where(inside, mid, jnp.zeros_like(mid))

    # conv2 over the (TH, TW) output region
    acc = jnp.zeros((TH * TW, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = mid[dy : dy + TH, dx : dx + TW, :].reshape(TH * TW, C)
            acc += jax.lax.dot_general(
                patch,
                w2_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += b2_ref[0].astype(jnp.float32)

    skip = x_tile[2 : 2 + TH, 2 : 2 + TW, :].reshape(TH * TW, C)
    out = acc + skip.astype(jnp.float32)
    out_ref[0] = out.reshape(TH, TW, C).astype(out_ref.dtype)


def fused_rcu(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    tile: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, C); w: (3, 3, C, C) HWIO; b: (C,).
    Returns x + conv2(relu(conv1(relu(x)))), both convs 3x3/pad 1."""
    B, H, W, C = x.shape
    if tile is None:
        # Mosaic stack-allocates each unrolled tap slice; keep the
        # per-tile working set well under the 16 MB VMEM budget.
        th = min(16, H)
        tw = min(64, W)
        tile = (th, tw)
    TH, TW = tile
    assert H % TH == 0 and W % TW == 0, (H, W, tile)

    x_pad = jnp.pad(x, ((0, 0), (2, 6), (2, 6), (0, 0)))
    w1r = w1.reshape(9, C, C).astype(x.dtype)
    w2r = w2.reshape(9, C, C).astype(x.dtype)
    b1r = b1.reshape(1, C).astype(jnp.float32)
    b2r = b2.reshape(1, C).astype(jnp.float32)

    grid = (B, H // TH, W // TW)
    kernel = functools.partial(_rcu_kernel, TH=TH, TW=TW, C=C, H=H, W=W)

    flops = 2 * B * 9 * C * C * ((TH + 2) * (TW + 2) + TH * TW) * (
        (H // TH) * (W // TW)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, TW, C),
            lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, TW + 8, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 * 2 + 2 * 9 * C * C * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, w1r, b1r, w2r, b2r)


def xla_rcu(x, w1, b1, w2, b2):
    """XLA reference implementation (same math as models/dpt.py RCU)."""
    h = jax.nn.relu(x)
    h = jax.lax.conv_general_dilated(
        h, w1.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1.astype(x.dtype)
    h = jax.nn.relu(h)
    h = jax.lax.conv_general_dilated(
        h, w2.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2.astype(x.dtype)
    return x + h
