#!/usr/bin/env python
"""Scatter lab 8: does a (key, idx) sort + row gather beat carrying the
3 f32 payload columns through lax.sort?

After lab7 (block sweep: negative) the occ voxelizer's largest single
term is the ~5.3 ms 4-operand sort. A bitonic sort's cost scales with
bytes moved per row: (key + 3 payloads) = 16 B vs (key + idx) = 8 B.
The open question was whether the post-sort row gather (2.07M x 12 B
random reads) gives the saving back. It does, and then some — measured
on the real v5e (chained protocol, occ shape N=2.07M, G=2.10M):

    sort4_key_plus_3xf32            5.15 ms   <- production path
    sort2_key_idx_then_gather      11.83 ms
    sort1_int64_packed_then_gather 13.06 ms
    gather_rows_only               22.14 ms

A bare 2M-row gather costs 4x the whole 4-operand sort: TPU random row
gathers run ~1 row per load, the same pathology that motivated the
sort+one-hot-matmul voxelizer in the first place (PERF.md). NEGATIVE
RESULT: payloads ride the sort; no gather anywhere on the hot path.

PROTOCOL GOTCHA (cost one wrong conclusion before this rerun): timing
back-to-back identical dispatches of a pure-XLA jit through the axon
tunnel WITHOUT chaining reads ~0.03 ms/call — identical (executable,
args) executions are elided somewhere below jax. Every number above
uses scatter_lab3.chain_time, which threads a data dependency through
the loop. Kernels containing a Pallas custom-call (lab7) did not show
the elision, which is why lab7's sweep was credible unchained.

Usage: timeout 3600 python scripts/scatter_lab8.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # the int64 packed route

    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
        ),
    )
    from scatter_lab3 import chain_time

    N = 2073600
    G = 256 * 256 * 32
    rng = np.random.default_rng(0)
    # chain_time's carry perturbs the first argument; keys enter as f32
    # and are cast inside so the sort cannot be hoisted out of the loop
    lin_f = jnp.asarray(rng.integers(0, G, size=(N,)).astype(np.float32))
    vals = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))

    def report(name, t):
        print(json.dumps({"exp": name, "ms": round(t * 1e3, 3)}), flush=True)

    def sort4(kf, v):
        k = kf.astype(jnp.int32)
        s = jax.lax.sort(
            (k, v[:, 0], v[:, 1], v[:, 2]), dimension=0, num_keys=1
        )
        return s[0].astype(jnp.float32) + s[1] + s[2] + s[3]

    report("sort4_key_plus_3xf32", chain_time(sort4, lin_f, vals))

    def sort2_gather(kf, v):
        k = kf.astype(jnp.int32)
        idx = jnp.arange(k.shape[0], dtype=jnp.int32)
        ks, ix = jax.lax.sort((k, idx), dimension=0, num_keys=1)
        vt = jnp.take(v, ix, axis=0)
        return ks.astype(jnp.float32) + vt[:, 0] + vt[:, 1] + vt[:, 2]

    report("sort2_key_idx_then_gather", chain_time(sort2_gather, lin_f, vals))

    def sort1_packed(kf, v):
        k = kf.astype(jnp.int64)
        idx = jnp.arange(k.shape[0], dtype=jnp.int64)
        packed = (k << 21) | idx
        ps = jax.lax.sort(packed, dimension=0)
        ks = (ps >> 21).astype(jnp.int32)
        ix = (ps & ((1 << 21) - 1)).astype(jnp.int32)
        vt = jnp.take(v, ix, axis=0)
        return ks.astype(jnp.float32) + vt[:, 0] + vt[:, 1] + vt[:, 2]

    report(
        "sort1_int64_packed_then_gather", chain_time(sort1_packed, lin_f, vals)
    )

    def gather_only(kf, v):
        ix = jnp.clip(kf.astype(jnp.int32) % N, 0, N - 1)
        vt = jnp.take(v, ix, axis=0)
        return vt[:, 0] + vt[:, 1] + vt[:, 2]

    report("gather_rows_only", chain_time(gather_only, lin_f, vals))


if __name__ == "__main__":
    main()
