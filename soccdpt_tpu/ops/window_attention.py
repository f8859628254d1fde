"""Pallas TPU kernels: fused scaled-cosine window attention (Swin V2).

QK^T, per-head learned temperature, continuous relative-position bias,
optional shifted-window mask, softmax and PV all stay resident in VMEM —
the (N, N) attention matrix never round-trips HBM. This is the marquee
kernel of the rebuild (BASELINE.json north star; SURVEY.md §7.3 risk
#1). The XLA einsum path in models/backbones/swin2.py is the correctness
fallback; the parity tests (tests/test_window_attention.py) pin the two
together.

Two granularities:

* ``cosine_window_attention`` — one program per (window, head); the
  original round-1 kernel.
* ``cosine_window_attention_batched`` — G windows x one head per
  program: the rel-pos bias block is fetched once per G windows instead
  of once per window, grid overhead is amortized, and block transfers
  pipeline across a larger grid step. G adapts to VMEM (attention
  scratch capped at ~4 MB) and to divisibility of the window count.

``pallas_window_attention`` wraps the batched kernel in a
``jax.custom_vjp`` whose backward recomputes attention with the plain
XLA ops (the standard flash-attention recompute strategy) — so the
Pallas path is trainable, removing the round-1 inference-only guard.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(scale_ref, q_ref, k_ref, v_ref, bias_ref, out_ref):
    """q/k/v: (1, 1, N, d) blocks; bias: (1, N, N); scale: full (H, 1)
    array in SMEM, indexed by the head program id."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = scale_ref[pl.program_id(1), 0]

    attn = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, N)
    attn = attn * s + bias_ref[0].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _attn_kernel_masked(
    scale_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref
):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = scale_ref[pl.program_id(1), 0]

    attn = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    attn = attn * s + bias_ref[0].astype(jnp.float32)
    attn = attn + mask_ref[0].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def cosine_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused window attention.

    q, k:  (Bw, H, N, d) — already L2-normalized along d
    v:     (Bw, H, N, d)
    scale: (H, 1, 1) positive per-head temperature (already exp/clamped)
    bias:  (H, N, N) relative-position bias (already 16*sigmoid)
    mask:  (nW, N, N) additive shifted-window mask or None; when given,
           window ``i`` of the flat Bw axis uses ``mask[i % nW]``.
    Returns (Bw, H, N, d).
    """
    Bw, H, N, d = q.shape
    scale_2d = scale.reshape(H, 1).astype(jnp.float32)
    bias = bias.astype(jnp.float32)

    qkv_spec = pl.BlockSpec(
        (1, 1, N, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (1, N, N), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    # full (H, 1) scale array resident in SMEM (block == array shape)
    scale_spec = pl.BlockSpec(
        (H, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, N, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )

    flops = 2 * Bw * H * (N * N * d * 2)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=q.size * 4 * 3 + Bw * H * N * d * 4,
        transcendentals=Bw * H * N * N,
    )

    if mask is None:
        return pl.pallas_call(
            _attn_kernel,
            grid=(Bw, H),
            in_specs=[scale_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bw, H, N, d), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(scale_2d, q, k, v, bias)

    nW = mask.shape[0]
    mask_spec = pl.BlockSpec(
        (1, N, N), lambda i, j: (i % nW, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _attn_kernel_masked,
        grid=(Bw, H),
        in_specs=[scale_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bw, H, N, d), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(scale_2d, q, k, v, bias, mask.astype(jnp.float32))


def _attn_kernel_batched(scale_ref, q_ref, k_ref, v_ref, bias_ref, out_ref):
    """q/k/v blocks: (G, 1, N, d); bias: (1, N, N); scale: (H, 1) SMEM."""
    q = q_ref[:, 0].astype(jnp.float32)  # (G, N, d)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0]
    s = scale_ref[pl.program_id(1), 0]

    attn = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, N, N)
    attn = attn * s + bias_ref[0].astype(jnp.float32)[None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, 0] = out.astype(out_ref.dtype)


def _attn_kernel_batched_masked(
    scale_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref
):
    q = q_ref[:, 0].astype(jnp.float32)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0]
    s = scale_ref[pl.program_id(1), 0]

    attn = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    attn = attn * s + bias_ref[0].astype(jnp.float32)[None]
    attn = attn + mask_ref[...].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(v.dtype),
        v,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, 0] = out.astype(out_ref.dtype)


def _pick_group(Bw: int, N: int, nW: Optional[int]) -> int:
    """Windows per program: the largest divisor of the flat window count
    (and of the per-image window count when a shift mask is present, so
    one block sees contiguous masks) that keeps the (G, N, N) f32
    attention scratch within ~4 MB, capped at 8. Any divisor qualifies —
    odd window grids (e.g. 9 windows of 24 px on a 72-px padded stage)
    would never batch under a power-of-two-only rule."""
    for g in range(min(8, Bw), 1, -1):
        # VMEM budget: (G,N,N) f32 attention scratch, plus — on the
        # masked (shifted-window) path — the (G,N,N) f32 mask block,
        # double-buffered by the pipeline.
        vmem = g * N * N * 4 * (1 + (2 if nW is not None else 0))
        if (
            Bw % g == 0
            and (nW is None or nW % g == 0)
            and vmem <= 4 * 1024 * 1024
        ):
            return g
    return 1


def cosine_window_attention_batched(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same contract as :func:`cosine_window_attention`, G windows per
    program. Falls back to the per-window kernel when no G > 1 fits."""
    Bw, H, N, d = q.shape
    nW = None if mask is None else int(mask.shape[0])
    G = _pick_group(Bw, N, nW)
    if G == 1:
        return cosine_window_attention(
            q, k, v, scale, bias, mask, interpret=interpret
        )

    scale_2d = scale.reshape(H, 1).astype(jnp.float32)
    bias = bias.astype(jnp.float32)

    qkv_spec = pl.BlockSpec(
        (G, 1, N, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (1, N, N), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(
        (H, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )
    out_spec = pl.BlockSpec(
        (G, 1, N, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )

    flops = 2 * Bw * H * (N * N * d * 2)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=q.size * 4 * 3 + Bw * H * N * d * 4,
        transcendentals=Bw * H * N * N,
    )

    if mask is None:
        return pl.pallas_call(
            _attn_kernel_batched,
            grid=(Bw // G, H),
            in_specs=[scale_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bw, H, N, d), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(scale_2d, q, k, v, bias)

    # window i of the flat Bw axis uses mask[i % nW]; a block of G
    # consecutive windows therefore sees G consecutive masks (G | nW)
    mask_spec = pl.BlockSpec(
        (G, N, N),
        lambda i, j, n=nW // G: (i % n, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _attn_kernel_batched_masked,
        grid=(Bw // G, H),
        in_specs=[
            scale_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec,
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bw, H, N, d), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(scale_2d, q, k, v, bias, mask.astype(jnp.float32))


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _pallas_window_attention(q, k, v, scale, bias, mask, interpret):
    return cosine_window_attention_batched(
        q, k, v, scale, bias, mask, interpret=interpret
    )


def _pwa_fwd(q, k, v, scale, bias, mask, interpret):
    out = _pallas_window_attention(q, k, v, scale, bias, mask, interpret)
    return out, (q, k, v, scale, bias, mask)


def _pwa_bwd(interpret, residuals, g):
    # Flash-attention-style recompute backward: the forward ran fused in
    # VMEM; the backward re-derives the attention matrix with plain XLA
    # ops and lets autodiff produce exact cotangents for q/k/v/scale/bias
    # (the CPB-MLP bias and the learned temperature need gradients too).
    q, k, v, scale, bias, mask = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, s_, b_: xla_reference(q_, k_, v_, s_, b_, mask),
        q, k, v, scale, bias,
    )
    dq, dk, dv, dscale, dbias = vjp(g.astype(v.dtype))
    return dq, dk, dv, dscale, dbias, None


_pallas_window_attention.defvjp(_pwa_fwd, _pwa_bwd)


def pallas_window_attention(
    q, k, v, scale, bias, mask=None, interpret: bool = False
):
    """Differentiable fused window attention: Pallas forward (batched
    kernel), XLA-recompute backward. Drop-in for the XLA einsum path."""
    return _pallas_window_attention(q, k, v, scale, bias, mask, interpret)


def xla_reference(q, k, v, scale, bias, mask=None):
    """Plain-XLA reference implementation (same math), for parity tests."""
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    attn = attn * scale.astype(jnp.float32) + bias.astype(jnp.float32)[None]
    if mask is not None:
        Bw = q.shape[0]
        nW = mask.shape[0]
        H, N = q.shape[1], q.shape[2]
        attn = attn.reshape(Bw // nW, nW, H, N, N)
        attn = attn + mask.astype(jnp.float32)[None, :, None]
        attn = attn.reshape(Bw, H, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
