"""Pallas TPU kernel: dense segment-sum of SORTED rows via MXU one-hot
matmuls — the fast half of the occupancy voxelizer.

Why this exists: XLA lowers a width-C scatter-add on TPU v5e to a
serial ~40 ns/row loop (scripts/scatter_lab3.py) — 83 ms for the 2.07M
points x (256*256*32, 3) grid of the reference's occupancy contract
(reference SOccDPT.py:440-455). The TPU-native formulation is
sort-then-reduce: after a 1-D ``lax.sort`` (3.6 ms at 2M rows), each
grid cell's rows are contiguous, and the dense per-cell sums become a
sequence of small matmuls: for a tile of K sorted rows and a tile of
``Bc`` cells,

    out[c, b] += sum_k vals[c, k] * (cells[k] == base + b)

i.e. ``vals_tile @ one_hot(cells - base)`` — MXU work, no scatter. The
pairing of row tiles to cell tiles is data-dependent, so it is
precomputed on-device as a merge schedule (both sequences are sorted,
so pairs are ~R + O and the out-tile index is non-decreasing) and fed
through scalar prefetch; the out tile stays resident in VMEM across
consecutive schedule steps that hit it (Pallas flushes only when the
out index changes).

Everything is channel-minor-transposed — vals (C, N), out (C, S) — so
the minor dimension of every block is a lane-sized axis (K or Bc), not
the tiny channel count.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _schedule(lin_s, R: int, K: int, O: int, Bc: int, P: int):
    """Merge schedule on device: for each schedule step p, which row
    tile ``pr[p]`` accumulates into which cell tile ``po[p]``.

    lin_s: (R*K,) sorted cell ids (sentinel >= O*Bc for dropped rows).
    Returns int32 arrays (pr, po, pf, live) of length P:
    pf = first visit of this out tile (initialize), live = real pair
    with in-range rows (padding / empty tiles skip the matmul).

    Empty out tiles get NO visit: the kernel's output aliases a
    pre-zeroed buffer (input_output_aliases), so a tile no schedule
    step writes keeps its zeros — this drops the per-tile init visits
    that made the old grid R + 2*O steps (16.4k extra steps = ~6 ms at
    the batch-4 occupancy size, where per-step overhead dominates).
    """
    first = lin_s[:: K]  # (R,) first cell id of each row tile
    last = lin_s[K - 1 :: K]  # (R,) last cell id of each row tile

    o_idx = jnp.arange(O, dtype=jnp.int32)
    lo = o_idx * Bc
    hi = lo + Bc  # exclusive
    # row tiles intersecting out tile o: last >= lo and first < hi.
    # method="sort": the default binary-search lowering is a vmapped
    # while-loop of 1-row gathers at ~1.6 GB/s on TPU — 8.4 ms/step at
    # the batch-4 occupancy size (profile_step.py --what occ --batch 4);
    # the sort-based lowering is one small O(R+O) sort.
    rs = jnp.searchsorted(last, lo, side="left", method="sort").astype(
        jnp.int32
    )
    re = jnp.searchsorted(first, hi, side="left", method="sort").astype(
        jnp.int32
    )  # excl
    cnt_real = jnp.maximum(re - rs, 0)
    has = cnt_real > 0
    cnt = cnt_real  # empty tiles: no visit (aliased zeros cover them)

    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)]
    )
    total = starts[-1]

    p_idx = jnp.arange(P, dtype=jnp.int32)
    # po[p] = which out tile: the o whose [starts[o], starts[o+1]) holds p
    po = (
        jnp.searchsorted(
            starts, p_idx, side="right", method="sort"
        ).astype(jnp.int32)
        - 1
    )
    po = jnp.clip(po, 0, O - 1)
    # Tail padding steps (p >= total; P > total always) must NOT visit a
    # tile no real step wrote: on real TPU, Pallas flushes the output
    # VMEM window to HBM when the out index changes (and at grid end)
    # and never loads output windows from HBM — a tail visit to an
    # unwritten tile would copy stale VMEM from a previously visited
    # tile over that tile's pre-zeroed aliased HBM block (the interpret
    # emulator reads blocks back from the zeroed buffer and cannot see
    # this). Route tails to the tile of the LAST real step: same out
    # index, so the window stays resident and the one grid-end flush
    # writes that tile's correct, initialized contents. If the schedule
    # is entirely empty (total == 0), route to tile 0 and force an init
    # visit at step 0 so the flushed window is explicit zeros.
    is_tail = p_idx >= total
    last_po = jnp.take(po, jnp.maximum(total - 1, 0))
    tail_po = jnp.where(total > 0, last_po, 0)
    po = jnp.where(is_tail, tail_po, po)
    within = p_idx - jnp.take(starts, po)
    pr = jnp.clip(jnp.take(rs, po) + within, 0, R - 1)
    pf = ((within == 0) & ~is_tail).astype(jnp.int32)
    pf = jnp.where((total == 0) & (p_idx == 0), 1, pf)
    live = (
        ~is_tail & jnp.take(has, po) & (within < jnp.take(cnt_real, po))
    ).astype(jnp.int32)
    return pr, po, pf, live


def _kernel(
    pr_ref, po_ref, pf_ref, live_ref, lin_ref, vals_ref, acc_ref, out_ref
):
    del acc_ref  # HBM-resident zeros, aliased to out — never read here
    p = pl.program_id(0)
    o = po_ref[p]
    base = o * out_ref.shape[1]

    @pl.when(pf_ref[p] == 1)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(live_ref[p] == 1)
    def _accum():
        K = lin_ref.shape[2]
        Bc = out_ref.shape[1]
        # keys arrive on lanes (1, K); transpose the single 2 KB vector
        # to sublanes so the one-hot is (K, Bc) and the dot is the
        # MXU-natural (C, K) @ (K, Bc) — contracting the RHS minor dim
        # instead costs a 1 MB VREG transpose per step (measured 2.6x).
        local = (lin_ref[0] - base).T  # (K, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (K, Bc), 1)
        oh = (cols == local).astype(vals_ref.dtype)  # (K, Bc)
        # out (C, Bc) += vals (C, K) @ oh (K, Bc)
        # HIGHEST: multi-pass f32 on the MXU — with a one-hot operand the
        # products are exact, so the result matches a serial f32
        # scatter-add; default (bf16-pass) precision loses ~1e-3.
        out_ref[:] += jax.lax.dot_general(
            vals_ref[:],
            oh,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def sorted_segment_sum_tpu(
    lin_s: jnp.ndarray,
    vals_t: jnp.ndarray,
    num_slots: int,
    block_k: int = 512,
    block_c: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, num_slots) dense sums of ``vals_t[:, n]`` into slot
    ``lin_s[n]``, for SORTED lin_s; rows with lin_s >= num_slots drop.

    lin_s: (N,) int32 ascending. vals_t: (C, N) float32 (channel-minor
    layout; see module docstring). N must be a multiple of block_k and
    num_slots a multiple of block_c — callers pad (pad rows carry the
    sentinel, pad slots are sliced off).
    """
    C, N = vals_t.shape
    if N % block_k or num_slots % block_c:
        raise ValueError(
            f"N={N} % block_k={block_k} or S={num_slots} % block_c="
            f"{block_c} != 0"
        )
    R = N // block_k
    O = num_slots // block_c
    P = R + O  # merge pairs <= R + O - 1 (empty tiles get no visit)

    pr, po, pf, live = _schedule(lin_s, R, block_k, O, block_c, P)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(P,),
        in_specs=[
            # (1, 1, K) blocks of the (R, 1, K)-reshaped keys: the minor
            # dim is lane-sized, so the reshape from (N,) is a free
            # row-major view — the previous (N, 1) layout cost a 6.5 ms
            # relayout at 9.5 GB/s (profile_step.py --what occ --batch 4,
            # round 4). The unit middle dim satisfies Mosaic's rule that
            # the block's second-minor dim divide 8 or equal the array's.
            pl.BlockSpec(
                (1, 1, block_k), lambda p, pr, po, pf, live: (pr[p], 0, 0)
            ),
            pl.BlockSpec(
                (C, block_k), lambda p, pr, po, pf, live: (0, pr[p])
            ),
            # pre-zeroed accumulator, aliased to the output below: stays
            # in HBM (never read by the kernel); out tiles the schedule
            # never visits keep its zeros.
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, block_c), lambda p, pr, po, pf, live: (0, po[p])
        ),
    )
    zeros = jnp.zeros((C, num_slots), jnp.float32)
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, num_slots), jnp.float32),
        # operand index counts the scalar-prefetch args (pr, po, pf,
        # live) first, then (lin, vals, zeros) -> zeros is input 6.
        input_output_aliases={6: 0},
        interpret=interpret,
    )(pr, po, pf, live, lin_s.reshape(R, 1, block_k), vals_t, zeros)
    return out


def segment_sum_sorted_pallas(
    lin: jnp.ndarray,
    vals: jnp.ndarray,
    num_slots: int,
    block_k: int = 512,
    block_c: int = 512,
    interpret: bool = False,
    sort_segments: int = 1,
    transposed: bool = False,
) -> jnp.ndarray:
    """(num_slots, C) = scatter-add of UNSORTED rows, TPU-fast path.
    ``transposed=True`` returns the kernel's native (C, num_slots)
    channel-minor layout instead — no transpose at all.

    Sorts (key + C payload columns, 1-D — never under vmap:
    scripts/scatter_lab5.py), pads rows to block_k and slots to
    block_c, runs the Pallas merge-schedule kernel, slices back.
    Numerically exact (f32 adds of the same values in sorted order).

    ``sort_segments = B > 1`` splits the sort into B independent 1-D
    sorts over equal slices of ``lin`` — for batch-folded keys (slice b
    holds keys in [b*num_cells, (b+1)*num_cells)), concatenating the
    per-slice sorted runs is globally sorted, and B sorts of N/B rows
    beat one sort of N rows (lax.sort is O(N log^2 N) bitonic work on
    TPU; measured on the occupancy contract, see PERF.md). OOB rows
    (key >= num_slots or < 0) are routed to the owning slice's TOP key
    with zeroed payload — a mid-array global sentinel would break the
    sortedness the kernel schedule requires. Requires N and num_slots
    both divisible by B (the batch-folded convention); otherwise falls
    back to one flat sort.
    """
    N = lin.shape[0]
    C = vals.shape[-1]
    S_pad = -(-num_slots // block_c) * block_c
    N_pad = -(-N // block_k) * block_k
    sentinel = jnp.int32(S_pad)
    use_segments = (
        sort_segments > 1
        and N % sort_segments == 0
        and num_slots % sort_segments == 0
    )
    if use_segments:
        n_seg = N // sort_segments
        seg_cells = num_slots // sort_segments
        oob = (lin >= num_slots) | (lin < 0)
        seg_id = jnp.arange(N, dtype=jnp.int32) // n_seg
        lin = jnp.where(oob, (seg_id + 1) * seg_cells - 1, lin)
        vals = jnp.where(oob[:, None], jnp.zeros_like(vals), vals)
    else:
        lin = jnp.where(lin >= num_slots, sentinel, lin)
    cols = tuple(vals[:, i] for i in range(C))
    if use_segments:
        parts = []
        for b in range(sort_segments):
            sl = slice(b * n_seg, (b + 1) * n_seg)
            parts.append(
                jax.lax.sort(
                    (lin[sl],) + tuple(c[sl] for c in cols),
                    dimension=0,
                    num_keys=1,
                )
            )
        sorted_ops = tuple(
            jnp.concatenate([p[i] for p in parts]) for i in range(1 + C)
        )
    else:
        sorted_ops = jax.lax.sort((lin,) + cols, dimension=0, num_keys=1)
    lin_s = sorted_ops[0]
    if N_pad != N:
        lin_s = jnp.concatenate(
            [lin_s, jnp.full((N_pad - N,), sentinel, lin_s.dtype)]
        )
    vals_t = jnp.stack(
        [
            jnp.concatenate([c, jnp.zeros((N_pad - N,), c.dtype)])
            if N_pad != N
            else c
            for c in sorted_ops[1:]
        ],
        axis=0,
    )  # (C, N_pad)
    # pad channels to a full sublane (8) so the (C, K) matmul operand
    # has an aligned second-minor dim
    C_pad = max(8, -(-C // 8) * 8)
    if C_pad != C:
        vals_t = jnp.concatenate(
            [vals_t, jnp.zeros((C_pad - C, N_pad), vals_t.dtype)]
        )
    out_t = sorted_segment_sum_tpu(
        lin_s, vals_t.astype(jnp.float32), S_pad, block_k, block_c, interpret
    )
    out_t = out_t[:C, :num_slots]
    return out_t if transposed else out_t.T
