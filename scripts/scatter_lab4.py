#!/usr/bin/env python
"""Scatter lab 4: row-width sweep for the occupancy scatter.

lab3 (honest chained timing) found per-row cost depends strongly on row
width: C=1 -> 6.65 ns, C=3 -> 40.3 ns, C=96 -> 16.7 ns. If width 4 or 8
sits near the width-1 cost, zero-padding the class axis 3->4 collapses
the in-model 83 ms scatter directly. Also measures gather widths and
searchsorted for the sort+gather route.

Usage: timeout 3600 python scripts/scatter_lab4.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scatter_lab3 import chain_time  # honest chained-differencing timer


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
    lin = rng.integers(1, G, size=(N,), dtype=np.int32)
    lin_j = jnp.asarray(lin)

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

    for c in (1, 2, 3, 4, 8, 16, 32, 128):
        v = jnp.asarray(rng.uniform(size=(N, c)).astype(np.float32))

        def sc(v, l, c=c):
            return jnp.zeros((G, c), v.dtype).at[l].add(v, mode="drop")

        t = chain_time(sc, v, lin_j)
        report(f"scatter_width{c}", t)

    # padded-grid variant actually usable in-model: vals (N,3) padded to
    # (N,4) inside the jit, grid (G,4), slice [:, :3] after
    v3 = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))

    def sc_pad(v, l):
        vp = jnp.pad(v, ((0, 0), (0, 1)))
        return jnp.zeros((G, 4), v.dtype).at[l].add(vp, mode="drop")[:, :3]

    t = chain_time(sc_pad, v3, lin_j)
    report("scatter_pad3to4_slice", t)

    # three separate width-1 scatters
    def sc3x1(v, l):
        outs = [
            jnp.zeros((G,), v.dtype).at[l].add(v[:, i], mode="drop")
            for i in range(3)
        ]
        return jnp.stack(outs, -1)

    t = chain_time(sc3x1, v3, lin_j)
    report("scatter_3x_width1", t)

    # class folded into index: 3N width-1 rows
    def sc_fold(v, l):
        l3 = (l[:, None] * 3 + jnp.arange(3)[None, :]).reshape(-1)
        return jnp.zeros((G * 3,), v.dtype).at[l3].add(
            v.reshape(-1), mode="drop"
        )

    t = chain_time(sc_fold, v3, lin_j)
    report("scatter_classfolded_6M_width1", t, rows=3 * N)

    # scalar (0-d update) scatter: index (N,2) over (G, 3) grid
    def sc_2d(v, l):
        cols = jnp.tile(jnp.arange(3, dtype=jnp.int32), N)
        idx = jnp.stack([jnp.repeat(l, 3), cols], -1)
        z = jnp.zeros((G, 3), v.dtype)
        return z.at[idx[:, 0], idx[:, 1]].add(v.reshape(-1), mode="drop")

    t = chain_time(sc_2d, v3, lin_j)
    report("scatter_scalar_2dindex", t, rows=3 * N)

    # gather width dependence (sort+gather route needs (G,) gathers of
    # cumsum rows)
    for c in (1, 3, 4):
        src = jnp.asarray(rng.uniform(size=(N + 1, c)).astype(np.float32))
        q = jnp.asarray(rng.integers(0, N, size=(G,), dtype=np.int32))

        def ga(s, ql, c=c):
            return s[ql].sum(0)

        t = chain_time(ga, src, q)
        report(f"gather_G_rows_width{c}", t, rows=G)

    # searchsorted: 2M sorted keys, G dense queries. Float queries are the
    # chained carry (int carries would be perturbed by 0 and hoistable).
    keys = jnp.asarray(np.sort(lin).astype(np.float32))
    qs = jnp.asarray(np.arange(0, G, 1, dtype=np.float32))

    def ss(q, k):
        return jnp.searchsorted(k, q, side="left")

    t = chain_time(ss, qs, keys)
    report("searchsorted_G_queries", t, rows=G)


if __name__ == "__main__":
    main()
