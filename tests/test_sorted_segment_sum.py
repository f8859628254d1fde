"""Tests for the Pallas sorted-segment-sum voxelizer kernel
(ops/sorted_segment_sum.py) — interpret mode on CPU; the real-TPU
numbers live in PERF.md / scripts/scatter_lab*.py.

Oracle: per-row numpy add into the dense grid (the semantics of the
reference's GT voxelize, bdd_helper.py:319-337).
"""
import numpy as np
import pytest
from unittest import mock

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

from soccdpt_tpu.ops.sorted_segment_sum import segment_sum_sorted_pallas


def _oracle(lin, vals, S):
    out = np.zeros((S, vals.shape[1]), np.float32)
    for i in range(len(lin)):
        if 0 <= lin[i] < S:
            out[lin[i]] += vals[i]
    return out


@pytest.mark.parametrize(
    "N,S,C,bk,bc",
    [
        (1000, 96, 3, 64, 16),  # OOB rows drop, row/slot padding
        (333, 40, 2, 32, 8),  # N % bk != 0, S % bc != 0
        (64, 256, 1, 64, 32),  # more slots than rows (empty tiles)
        (512, 16, 3, 64, 16),  # heavy duplication into few cells
    ],
)
def test_kernel_matches_oracle(N, S, C, bk, bc):
    rng = np.random.default_rng(N + S + C)
    lin = rng.integers(0, S + max(4, S // 4), size=(N,)).astype(np.int32)
    vals = rng.uniform(size=(N, C)).astype(np.float32)
    got = np.asarray(
        segment_sum_sorted_pallas(
            jnp.asarray(lin),
            jnp.asarray(vals),
            S,
            block_k=bk,
            block_c=bc,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, _oracle(lin, vals, S), rtol=1e-5, atol=1e-5)


def test_kernel_all_rows_one_cell():
    # worst-case merge schedule: every row tile maps to one out tile
    N, S, C = 256, 64, 3
    lin = np.full((N,), 7, np.int32)
    vals = np.ones((N, C), np.float32)
    got = np.asarray(
        segment_sum_sorted_pallas(
            jnp.asarray(lin), jnp.asarray(vals), S,
            block_k=32, block_c=16, interpret=True,
        )
    )
    want = np.zeros((S, C), np.float32)
    want[7] = N
    np.testing.assert_allclose(got, want)


def test_geometry_pallas_method_matches_scatter():
    """points_to_occupancy_grid(method='pallas') == method='scatter',
    values and gradients, via interpret mode on CPU."""
    from soccdpt_tpu.core.config import OccupancyConfig
    from soccdpt_tpu.ops import sorted_segment_sum as sss
    from soccdpt_tpu.ops.geometry import points_to_occupancy_grid

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    occ = OccupancyConfig(grid_size=(16, 16, 8))
    rng = np.random.default_rng(3)
    B, N, C = 2, 700, 3
    shape_m = np.asarray(occ.occupancy_shape, np.float32)
    points = (rng.random((B, N, 3)).astype(np.float32) * 1.4 - 0.2) * shape_m
    points[0, :5] = np.inf
    sem = rng.random((B, N, C)).astype(np.float32)

    with mock.patch.object(sss.pl, "pallas_call", interp):
        got = np.asarray(
            points_to_occupancy_grid(points, sem, occ, C, method="pallas")
        )
        w = rng.random(got.shape[1:]).astype(np.float32)

        def loss_p(s):
            g = points_to_occupancy_grid(points, s, occ, C, method="pallas")
            return (g * w).sum()

        g_pallas = np.asarray(jax.grad(loss_p)(sem))

    want = np.asarray(
        points_to_occupancy_grid(points, sem, occ, C, method="scatter")
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def loss_s(s):
        g = points_to_occupancy_grid(points, s, occ, C, method="scatter")
        return (g * w).sum()

    g_scatter = np.asarray(jax.grad(loss_s)(sem))
    np.testing.assert_allclose(g_pallas, g_scatter, rtol=1e-5, atol=1e-5)


def test_kernel_empty_trailing_tiles_stay_zero():
    """No-init-visit schedule (round 4): out tiles the schedule never
    visits must keep the aliased zeros, including when tail (padding)
    pairs are clipped onto trailing EMPTY tiles. Verified exact on the
    real TPU (round 4); this guards the interpret path."""
    N, S, C = 256, 512, 3
    lin = np.full((N,), 3, np.int32)  # everything lands in out tile 0
    vals = np.ones((N, C), np.float32)
    got = np.asarray(
        segment_sum_sorted_pallas(
            jnp.asarray(lin), jnp.asarray(vals), S,
            block_k=64, block_c=64, interpret=True,
        )
    )
    want = np.zeros((S, C), np.float32)
    want[3] = N
    np.testing.assert_allclose(got, want)


def test_kernel_all_rows_dropped():
    """total == 0 merge pairs: every row carries the OOB sentinel; the
    whole output must be the aliased zeros."""
    N, S, C = 128, 256, 2
    lin = np.full((N,), S + 5, np.int32)
    vals = np.ones((N, C), np.float32)
    got = np.asarray(
        segment_sum_sorted_pallas(
            jnp.asarray(lin), jnp.asarray(vals), S,
            block_k=64, block_c=64, interpret=True,
        )
    )
    np.testing.assert_allclose(got, np.zeros((S, C), np.float32))


def test_schedule_tail_steps_target_initialized_tile():
    """Real-TPU flush invariant (ADVICE r4, high): Pallas copies the
    output VMEM window to HBM when the out index changes / at grid end
    and never loads output windows from HBM, so every tile the schedule
    VISITS must be written (pf=1 init or accumulation) before its
    copy-out. Tail padding steps (p >= total) must therefore target the
    tile of the last REAL step — never a trailing empty tile. Checked
    structurally here because the interpret emulator reads output
    blocks back from the zeroed aliased buffer and cannot reproduce the
    stale-window flush; the hardware behavior is exercised by
    scripts/tpu_kernel_checks.py on the real chip."""
    from soccdpt_tpu.ops.sorted_segment_sum import _schedule

    K, Bc = 64, 64

    def check(lin_sorted, O):
        R = len(lin_sorted) // K
        P = R + O
        pr, po, pf, live = (
            np.asarray(a)
            for a in _schedule(jnp.asarray(lin_sorted), R, K, O, Bc, P)
        )
        visited_first = {}
        for p in range(P):
            if po[p] not in visited_first:
                visited_first[po[p]] = (pf[p], live[p])
        for o, (first_pf, first_live) in visited_first.items():
            # first visit of any visited tile must write the window
            assert first_pf == 1 or first_live == 1, (o, first_pf, first_live)
        # consecutive-visit runs: each tile appears as one contiguous run
        runs = [po[0]]
        for p in range(1, P):
            if po[p] != runs[-1]:
                runs.append(po[p])
        assert len(runs) == len(set(runs)), runs
        return pr, po, pf, live

    # everything in tile 0, 7 trailing empty tiles: tails must stay on 0
    lin = np.full((4 * K,), 3, np.int32)
    _, po, _, _ = check(lin, 8)
    assert set(po.tolist()) == {0}

    # last real tile is tile 2 of 8 — tails must target 2, not 7
    lin = np.sort(
        np.r_[np.full(3 * K, 5), np.full(K, 2 * Bc + 1)].astype(np.int32)
    )
    _, po, _, _ = check(lin, 8)
    assert po[-1] == 2 and 7 not in po

    # all rows dropped (sentinel >= O*Bc): tile 0 gets a forced init
    lin = np.full((2 * K,), 8 * Bc, np.int32)
    _, po, pf, live = check(lin, 8)
    assert set(po.tolist()) == {0} and pf[0] == 1 and live.sum() == 0


def test_segmented_sort_oob_keys_are_safe():
    """ADVICE r4 (low): with sort_segments>1, keys >= num_slots in any
    slice must not break the global-sortedness invariant — they are
    routed per-slice to the slice's top key with zeroed payload."""
    rng = np.random.default_rng(17)
    B, n, cells = 4, 256, 48
    lin_b = rng.integers(0, cells, size=(B, n)).astype(np.int32)
    lin = (lin_b + np.arange(B)[:, None] * cells).reshape(-1)
    # scatter OOB keys into the FIRST slices (the breaking case) and a
    # couple of negatives
    lin[5:40] = B * cells + rng.integers(0, 100, size=35)
    lin[300:310] = B * cells
    lin[700] = -3
    vals = rng.uniform(size=(B * n, 3)).astype(np.float32)
    got = np.asarray(
        segment_sum_sorted_pallas(
            jnp.asarray(lin), jnp.asarray(vals), B * cells,
            sort_segments=B, block_k=64, block_c=16, interpret=True,
        )
    )
    np.testing.assert_allclose(
        got, _oracle(lin, vals, B * cells), rtol=1e-5, atol=1e-5
    )


def test_kernel_segmented_sort_matches_oracle():
    """sort_segments=B on batch-folded keys (slice b's keys all in
    [b*cells, (b+1)*cells)) must equal the flat-sort result and the
    oracle — per-slice sorted runs concatenate globally sorted."""
    rng = np.random.default_rng(99)
    B, n, cells = 4, 256, 48
    lin_b = rng.integers(0, cells, size=(B, n)).astype(np.int32)
    lin = (lin_b + np.arange(B)[:, None] * cells).reshape(-1)
    vals = rng.uniform(size=(B * n, 3)).astype(np.float32)
    kw = dict(block_k=64, block_c=16, interpret=True)
    got = np.asarray(
        segment_sum_sorted_pallas(
            jnp.asarray(lin), jnp.asarray(vals), B * cells,
            sort_segments=B, **kw,
        )
    )
    flat = np.asarray(
        segment_sum_sorted_pallas(
            jnp.asarray(lin), jnp.asarray(vals), B * cells, **kw
        )
    )
    want = _oracle(lin, vals, B * cells)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got, flat, rtol=0, atol=0)
