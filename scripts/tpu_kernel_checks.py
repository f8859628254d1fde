"""Real-TPU correctness checks for the Pallas voxelizer kernel.

The interpret-mode tests (tests/test_sorted_segment_sum.py) emulate
output windows by reading blocks back from the aliased zero buffer; real
Mosaic never loads output windows from HBM and flushes the resident VMEM
window whenever the out index changes (and at grid end). Any schedule
step that visits a tile no real step wrote therefore copies STALE VMEM
over that tile's pre-zeroed HBM block — a hardware-only failure mode
(ADVICE r4, high). This script runs the exact adversarial layouts on the
real chip and asserts bit-correct grids.

Run: ``timeout 900 python scripts/tpu_kernel_checks.py`` (axon TPU is
the default platform). Exit 0 = all checks pass on hardware.
"""
from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from soccdpt_tpu.ops.sorted_segment_sum import segment_sum_sorted_pallas


def _oracle(lin, vals, S):
    out = np.zeros((S, vals.shape[1]), np.float32)
    for i in range(len(lin)):
        if 0 <= lin[i] < S:
            out[lin[i]] += vals[i]
    return out


def _run(name, lin, vals, S, **kw):
    got = np.asarray(
        segment_sum_sorted_pallas(jnp.asarray(lin), jnp.asarray(vals), S, **kw)
    )
    want = _oracle(np.asarray(lin), np.asarray(vals), S)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5, err_msg=name)
    print(f"  ok: {name}")


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    if dev.platform not in ("tpu", "axon"):
        print("WARNING: not a TPU — checks run but prove nothing new")

    rng = np.random.default_rng(0)

    # 1. Stale-window flush: dense early tiles, many trailing EMPTY out
    #    tiles. Pre-fix, tail schedule steps visited tile O-1 unwritten;
    #    the grid-end flush then overwrote its zeros with tile-0 VMEM.
    N, S, C = 2048, 8192, 3
    lin = rng.integers(0, 512, size=(N,)).astype(np.int32)  # tiles 0 only
    vals = rng.uniform(size=(N, C)).astype(np.float32)
    _run("trailing empty tiles (512-slot data in 8192 grid)",
         lin, vals, S, block_k=512, block_c=512)

    # 2. Last real tile mid-grid: data ends at tile 2 of 16.
    lin = np.r_[
        rng.integers(0, 512, size=(N - 64,)),
        rng.integers(2 * 512, 2 * 512 + 40, size=(64,)),
    ].astype(np.int32)
    _run("last real tile mid-grid", lin, vals, S, block_k=512, block_c=512)

    # 3. All rows dropped (sentinel): forced init visit of tile 0.
    lin = np.full((N,), S + 7, np.int32)
    _run("all rows dropped", lin, vals, S, block_k=512, block_c=512)

    # 4. Interior empty tiles between visited tiles (window flush on out
    #    index CHANGE, not just grid end).
    lin = np.r_[
        rng.integers(0, 512, size=(N // 2,)),
        rng.integers(5 * 512, 6 * 512, size=(N // 2,)),
    ].astype(np.int32)
    _run("interior empty tiles", lin, vals, S, block_k=512, block_c=512)

    # 5. Segmented sort with OOB keys in EARLY slices (ADVICE r4 low):
    #    per-slice top-key routing must preserve global sortedness.
    B, n, cells = 4, 2048, 2048
    lin_b = rng.integers(0, cells, size=(B, n)).astype(np.int32)
    lin = (lin_b + np.arange(B)[:, None] * cells).reshape(-1)
    lin[5:40] = B * cells + rng.integers(0, 100, size=35)
    lin[4000] = -2
    vals = rng.uniform(size=(B * n, C)).astype(np.float32)
    _run("segmented sort, OOB keys in early slices",
         lin, vals, B * cells, block_k=512, block_c=512, sort_segments=B)

    # 6. Occupancy-contract shape smoke (the production size).
    N, S = 256 * 256, 64 * 64 * 16
    lin = rng.integers(0, S + S // 8, size=(N,)).astype(np.int32)
    vals = rng.uniform(size=(N, C)).astype(np.float32)
    _run("production-shape smoke (65k rows, 65k slots)",
         lin, vals, S, block_k=512, block_c=512)

    print("ALL TPU KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
