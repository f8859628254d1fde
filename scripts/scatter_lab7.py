#!/usr/bin/env python
"""Scatter lab 7: Pallas segment-sum block-size sweep at the occ shape.

After the round-4 occ-head rework the voxelizer is the occ-train
step's dominant term (sort 5.3 ms + pallas 5.0 ms of 18.9). The kernel
grid is P = N/block_k + S/block_c merge steps; at the default 512/512
that is ~8.1k steps whose fixed per-step overhead (one-hot build +
tile swaps) dominates the actual (8, K) @ (K, Bc) MXU work. Larger
blocks amortize it; this sweep measures the occ contract's exact
problem (N=2.07M rows, S=2.10M slots, C=3) per config.

Usage: timeout 3600 python scripts/scatter_lab7.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from soccdpt_tpu.ops.sorted_segment_sum import segment_sum_sorted_pallas

    H, W = 1080, 1920
    N = H * W  # 2,073,600 camera-resolution points
    S = 256 * 256 * 32  # 2,097,152 grid cells
    C = 3
    rng = np.random.default_rng(0)
    lin = jnp.asarray(rng.integers(0, S, N, dtype=np.int32))
    vals = jnp.asarray(rng.random((N, C)), jnp.float32)

    ref = None
    for bk, bc in [
        (512, 512),
        (1024, 512),
        (512, 1024),
        (1024, 1024),
        (2048, 1024),
        (1024, 2048),
        (2048, 2048),
    ]:
        fn = jax.jit(
            lambda l, v, bk=bk, bc=bc: segment_sum_sorted_pallas(
                l, v, S, block_k=bk, block_c=bc
            )
        )
        out = jax.block_until_ready(fn(lin, vals))
        if ref is None:
            ref = np.asarray(out)
        else:
            # different block splits reassociate the f32 adds of cells
            # that straddle a row-tile boundary -> 1-ulp diffs
            np.testing.assert_allclose(
                np.asarray(out), ref, rtol=1e-6, atol=1e-6
            )
        # chained timing: run k dispatches back to back, difference
        for _ in range(2):
            jax.block_until_ready(fn(lin, vals))
        k = 10
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(lin, vals)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / k * 1e3
        print(
            json.dumps(
                {
                    "block_k": bk,
                    "block_c": bc,
                    "ms_total_sort_plus_kernel": round(ms, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
