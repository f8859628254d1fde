"""Pallas TPU flash attention for the global-attention backbones.

BEiT/ViT attention at DPT resolutions runs over 577-4097 tokens; the
XLA einsum path materializes the (H, T, T) f32 attention matrix in HBM
every layer (67 MB at the 512-px grid) and, for BEiT, re-reads an
(H, T, T) relative-position bias of the same size. Profiling
dpt_beit_large_512 showed these round trips dominate the forward
(PERF.md). This kernel keeps the whole softmax(QK^T*s + bias)V
pipeline in VMEM: per program, one query block attends over the full
(padded) key range of one head — k/v for a head fit comfortably in
VMEM at these shapes, so no online-softmax streaming is needed.

Contract (matches the inline einsum path in models/backbones/vit.py):

    q, k, v : (B, H, T, d)  — any float dtype; d <= 128
    bias    : (H, T, T) f32 — pre-gathered rel-pos bias, or None
    scale   : python float  — applied to QK^T
    returns : (B, H, T, d) in v.dtype

Numerics: QK^T and PV accumulate in f32 on the MXU, softmax in f32 —
the same precision contract as the XLA path (parity-tested).
The backward is an XLA-recompute custom VJP (flash-attention recompute
strategy), so the kernel is trainable.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float, t_real: int):
    """No-bias variant. Blocks: q (1,1,BQ,d), k/v (1,1,Tp,d),
    out (1,1,BQ,d)."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, Tp)
    # mask padded keys
    tp = s.shape[-1]
    if tp != t_real:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < t_real, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _flash_kernel_bias(
    q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float, t_real: int
):
    """Bias variant. bias block: (1, BQ, Tp) f32."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[0].astype(jnp.float32)
    tp = s.shape[-1]
    if tp != t_real:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < t_real, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, T, d = q.shape
    # Pad T to the lane multiple first, then pick the largest query
    # block that divides it: padding to a multiple of block_q directly
    # wastes up to block_q-1 key columns in EVERY score row (33% at
    # T=577), which costs more than smaller query blocks do.
    tp = _round_up(T, 128)
    bq = next(
        (b for b in (block_q, 128) if b <= tp and tp % b == 0),
        tp,
    )

    if tp != T:
        pad = [(0, 0), (0, 0), (0, tp - T), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if bias is not None:
            # query-side padding is sliced off; key-side handled by the
            # in-kernel iota mask, so zero-padding the bias is fine.
            bias = jnp.pad(bias, [(0, 0), (0, tp - T), (0, tp - T)])

    grid = (B, H, tp // bq)
    qspec = pl.BlockSpec(
        (1, 1, bq, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    kvspec = pl.BlockSpec(
        (1, 1, tp, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (1, 1, bq, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    flops = 4 * B * H * T * T * d
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(
            q.size * q.dtype.itemsize * 3
            + (bias.size * 4 if bias is not None else 0)
        ),
        transcendentals=B * H * T * T,
    )
    if bias is None:
        out = pl.pallas_call(
            partial(_flash_kernel, scale=scale, t_real=T),
            grid=grid,
            in_specs=[qspec, kvspec, kvspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, H, tp, d), v.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v)
    else:
        bspec = pl.BlockSpec(
            (1, bq, tp), lambda b, h, i: (h, i, 0), memory_space=pltpu.VMEM
        )
        # Bias travels in ITS OWN dtype: the kernel upcasts each tile to
        # f32 in VMEM, so a bf16-stored bias cache (bias_cache.py
        # ``cache_dtype``) halves the dominant per-layer bias reads — an
        # eager .astype(f32) here would materialize a full-width copy in
        # HBM and forfeit the saving.
        out = pl.pallas_call(
            partial(_flash_kernel_bias, scale=scale, t_real=T),
            grid=grid,
            in_specs=[qspec, kvspec, kvspec, bspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, H, tp, d), v.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v, bias)
    return out[:, :, :T]


def _flash_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, t_real: int, has_bias: bool, bias_ref=None,
):
    """dq/dk/dv for one (b, h, query-block). Grid (B, H, nq) with the
    query-block index INNERMOST: the dk/dv output blocks are indexed by
    (b, h) only, so their VMEM windows stay resident across consecutive
    i steps — initialize at i == 0, accumulate after (the same
    consecutive-visit accumulation contract as the voxelizer kernel).

    Zero-padded query rows are harmless without masking: their g rows
    are zero, so dp = ds = 0 and they contribute nothing to dk/dv; their
    dq rows are garbage but sliced off by the caller. Padded KEY columns
    are masked to -1e30 exactly as in the forward.
    """
    i = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, Tp)
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    tp = s.shape[-1]
    if tp != t_real:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < t_real, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, Tp)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dk_ref[0, 0] = jnp.zeros(dk_ref.shape[2:], dk_ref.dtype)
        dv_ref[0, 0] = jnp.zeros(dv_ref.shape[2:], dv_ref.dtype)

    dk_ref[0, 0] += (
        jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    ).astype(dk_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def _flash_dbias_kernel(
    q_ref, k_ref, v_ref, g_ref, bias_ref, dbias_ref,
    *, scale: float, t_real: int,
):
    """dbias[h, qblock] = sum_b ds[b, h, qblock]. Grid (H, nq, B) with
    the BATCH index innermost so the (h, i)-indexed output window stays
    resident across the b accumulation."""
    b = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[0].astype(jnp.float32)
    tp = s.shape[-1]
    if tp != t_real:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < t_real, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    @pl.when(b == 0)
    def _init():
        dbias_ref[0] = jnp.zeros(dbias_ref.shape[1:], dbias_ref.dtype)

    dbias_ref[0] += ds.astype(dbias_ref.dtype)


def _flash_backward(
    q, k, v, bias, g, scale: float, block_q: int = 256,
    interpret: bool = False,
):
    """Pallas backward: (dq, dk, dv, dbias_or_None). Same recompute
    strategy as the forward-only-residuals flash algorithm — s/p are
    re-derived per block in VMEM, so the (H, T, T) score matrix never
    round-trips HBM (the XLA-recompute VJP materializes it twice; at
    beit_large_384's T=577 that is 2 x 21 MB f32 per layer per step)."""
    B, H, T, d = q.shape
    tp = _round_up(T, 128)
    bq = next((b for b in (block_q, 128) if b <= tp and tp % b == 0), tp)
    if tp != T:
        pad = [(0, 0), (0, 0), (0, tp - T), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        g = jnp.pad(g, pad)
        if bias is not None:
            bias = jnp.pad(bias, [(0, 0), (0, tp - T), (0, tp - T)])
    nq = tp // bq

    qspec = pl.BlockSpec(
        (1, 1, bq, d), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    kvspec = pl.BlockSpec(
        (1, 1, tp, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    dkvspec = pl.BlockSpec(
        (1, 1, tp, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    flops = 11 * B * H * T * T * d  # 5 matmuls + softmax vjp elementwise
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=q.size * q.dtype.itemsize * 4
        + (bias.size * bias.dtype.itemsize if bias is not None else 0),
        transcendentals=B * H * T * T,
    )
    in_specs = [qspec, kvspec, kvspec, qspec]
    operands = [q, k, v, g]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, bq, tp), lambda b, h, i: (h, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bias)

        def kern(q_r, k_r, v_r, g_r, b_r, dq_r, dk_r, dv_r):
            _flash_bwd_kernel(
                q_r, k_r, v_r, g_r, dq_r, dk_r, dv_r,
                scale=scale, t_real=T, has_bias=True, bias_ref=b_r,
            )
    else:

        def kern(q_r, k_r, v_r, g_r, dq_r, dk_r, dv_r):
            _flash_bwd_kernel(
                q_r, k_r, v_r, g_r, dq_r, dk_r, dv_r,
                scale=scale, t_real=T, has_bias=False,
            )

    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, H, nq),
        in_specs=in_specs,
        out_specs=[qspec, dkvspec, dkvspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, tp, d), q.dtype),
            jax.ShapeDtypeStruct((B, H, tp, d), jnp.float32),
            jax.ShapeDtypeStruct((B, H, tp, d), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
    dq = dq[:, :, :T]
    dk = dk[:, :, :T].astype(k.dtype)
    dv = dv[:, :, :T].astype(v.dtype)

    dbias = None
    if bias is not None:
        dbias = pl.pallas_call(
            partial(_flash_dbias_kernel, scale=scale, t_real=T),
            grid=(H, nq, B),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq, d), lambda h, i, b: (b, h, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, tp, d), lambda h, i, b: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, tp, d), lambda h, i, b: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bq, d), lambda h, i, b: (b, h, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bq, tp), lambda h, i, b: (h, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, tp), lambda h, i, b: (h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((H, tp, tp), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v, g, bias)
        dbias = dbias[:, :T, :T].astype(bias.dtype)
    return dq, dk, dv, dbias


def xla_reference(q, k, v, bias, scale):
    """Plain-XLA reference (the inline path in vit.py), for parity."""
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)[None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhnm,bhmd->bhnd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_mha(q, k, v, bias, scale, interpret, backward):
    return _flash_forward(q, k, v, bias, scale, interpret=interpret)


def _flash_fwd(q, k, v, bias, scale, interpret, backward):
    out = _flash_mha(q, k, v, bias, scale, interpret, backward)
    return out, (q, k, v, bias)


def _flash_bwd(scale, interpret, backward, residuals, g):
    """Two backward strategies, both exact:

    "pallas" (default): per-block recompute in VMEM (_flash_backward) —
    the (H, T, T) score/probability matrices never touch HBM.
    "xla": re-derive the attention matrix with plain XLA ops and let
    autodiff produce the cotangents; XLA materializes s and p in HBM
    (2 x 21 MB f32 per beit_large_384 layer), kept as the comparison
    baseline and the fallback for shapes the kernel rejects.
    """
    q, k, v, bias = residuals
    if backward == "pallas":
        dq, dk, dv, dbias = _flash_backward(
            q, k, v, bias, g, scale, interpret=interpret
        )
        return (dq, dk, dv, dbias) if bias is not None else (dq, dk, dv, None)
    if bias is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: xla_reference(q_, k_, v_, None, scale),
            q, k, v,
        )
        dq, dk, dv = vjp(g.astype(v.dtype))
        return dq, dk, dv, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: xla_reference(q_, k_, v_, b_, scale),
        q, k, v, bias,
    )
    dq, dk, dv, dbias = vjp(g.astype(v.dtype))
    return dq, dk, dv, dbias


_flash_mha.defvjp(_flash_fwd, _flash_bwd)


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
    interpret: bool = False,
    backward: str = "pallas",
) -> jnp.ndarray:
    """Differentiable fused global attention (see module docstring).
    ``backward`` selects the VJP strategy ("pallas" kernel recompute vs
    "xla" recompute — see _flash_bwd)."""
    return _flash_mha(q, k, v, bias, scale, interpret, backward)
