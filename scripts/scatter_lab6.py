#!/usr/bin/env python
"""Scatter lab 6: pick the production voxelizer pipeline.

lab5 found vmap is what killed the in-model sort (30 ms vs 3.6 ms
unvmapped); batch can instead fold into the key (b*G + lin, int32-safe
for B*G < 2^31). Remaining question: cheapest path from SORTED rows to
the dense (G, C) grid.

  A) 3x width-1 scatter-add on sorted indices (indices_are_sorted) —
     if sortedness unlocks a vectorized scatter path, no scan needed.
  B) segmented scan + ends via searchsorted(method='sort') + gather.
  C) segmented scan + ends via width-1 scatter-max + gather.

Usage: timeout 3600 python scripts/scatter_lab6.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scatter_lab3 import chain_time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
        ),
    )

    N = 2073600
    G = 256 * 256 * 32
    rng = np.random.default_rng(0)
    lin_sorted = np.sort(rng.integers(1, G, size=(N,), dtype=np.int32))
    lin_s = jnp.asarray(lin_sorted)
    lin_f = jnp.asarray(lin_sorted.astype(np.float32))  # perturbable carry
    vals = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))

    def report(name, t, rows=N, **kw):
        print(
            json.dumps(
                {
                    "exp": name,
                    "ms": round(t * 1e3, 3),
                    "ns_per_row": round(t / rows * 1e9, 2),
                    **kw,
                }
            ),
            flush=True,
        )

    # A1: single width-1 scatter-add, sorted indices, hint on
    def sc1_sorted(v, l):
        return jnp.zeros((G,), v.dtype).at[l].add(
            v[:, 0], mode="drop", indices_are_sorted=True
        )

    report("scatter1_sorted_hint", chain_time(sc1_sorted, vals, lin_s))

    # A2: same without the hint (sorted data, no flag)
    def sc1_nohint(v, l):
        return jnp.zeros((G,), v.dtype).at[l].add(v[:, 0], mode="drop")

    report("scatter1_sorted_nohint", chain_time(sc1_nohint, vals, lin_s))

    # A3: full pipeline A — sort + 3x width-1 sorted scatter
    def pipeA(kf, v):
        k = kf.astype(jnp.int32)
        s = jax.lax.sort([k, v[:, 0], v[:, 1], v[:, 2]], num_keys=1)
        ks = s[0]
        outs = [
            jnp.zeros((G,), v.dtype)
            .at[ks]
            .add(s[1 + i], mode="drop", indices_are_sorted=True)
            for i in range(3)
        ]
        return jnp.stack(outs, -1)

    report("pipeline_A_sort_3xw1sorted", chain_time(pipeA, lin_f, vals))

    # searchsorted with sort-based method, G dense queries
    qs = jnp.arange(G, dtype=jnp.int32)

    def ss_sort(kf):
        k = kf.astype(jnp.int32)
        return jnp.searchsorted(k, qs, side="right", method="sort").astype(
            jnp.float32
        )

    report("searchsorted_sortmethod_G", chain_time(ss_sort, lin_f), rows=G)

    # B: full pipeline — sort + segscan + ss(sort) + gather
    def pipeB(kf, v):
        k = kf.astype(jnp.int32)
        s = jax.lax.sort([k, v[:, 0], v[:, 1], v[:, 2]], num_keys=1)
        ks = s[0]
        vs = jnp.stack(s[1:], -1)
        flags = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])

        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, vb + jnp.where(fb[..., None], 0.0, va)

        _, scan_vals = jax.lax.associative_scan(comb, (flags, vs), axis=0)
        ends = jnp.searchsorted(ks, qs, side="right", method="sort")
        last = jnp.clip(ends - 1, 0, N - 1)
        out = jnp.take(scan_vals, last, axis=0)
        return jnp.where((ends > 0)[:, None], out, 0.0)

    report("pipeline_B_sort_scan_ss_gather", chain_time(pipeB, lin_f, vals))

    # C: full pipeline — sort + segscan + scatter-max ends + gather
    def pipeC(kf, v):
        k = kf.astype(jnp.int32)
        s = jax.lax.sort([k, v[:, 0], v[:, 1], v[:, 2]], num_keys=1)
        ks = s[0]
        vs = jnp.stack(s[1:], -1)
        flags = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])

        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, vb + jnp.where(fb[..., None], 0.0, va)

        _, scan_vals = jax.lax.associative_scan(comb, (flags, vs), axis=0)
        row_no = jnp.arange(1, N + 1, dtype=jnp.int32)
        ends = (
            jnp.zeros((G,), jnp.int32)
            .at[ks]
            .max(row_no, mode="drop", indices_are_sorted=True)
        )
        last = jnp.clip(ends - 1, 0, N - 1)
        out = jnp.take(scan_vals, last, axis=0)
        return jnp.where((ends > 0)[:, None], out, 0.0)

    report("pipeline_C_sort_scan_smax_gather", chain_time(pipeC, lin_f, vals))


if __name__ == "__main__":
    main()
