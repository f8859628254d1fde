#!/usr/bin/env python
"""Scatter lab, round 3 — HONEST timing.

scatter_lab.py / scatter_lab2.py used ``block_until_ready`` which does
NOT sync through the axon tunnel (utils/timing.py:5-7) — every number
they printed was dispatch time, not device time.  This lab re-measures
the occupancy-voxelize design space with the chained-differencing
protocol (N iterations inside one jit with a data dependency, scalar
value fetch, difference two chain lengths), the same protocol as
cli/bench.py.

Known truth from xprof (scripts/profile_step.py --what occ): the
in-model 2.07M-row scatter-add into the (256*256*32, 3) grid is ONE
custom fusion costing 82.8 ms at 0.5 GB/s => ~40 ns/row serial.

Experiments answer:
  a. per-row cost vs N (serial-loop hypothesis)
  b. does row width change per-row cost (C=3 vs 96-wide rows)?
  c. do dropped rows cost less (pre-aggregation viability)?
  d. indices_are_sorted / unique_indices fast path?
  e. cost of lax.sort (2M key+3 payload) and cumsum (segment-sum route)
  f. .at[].set vs .at[].add
  g. jnp.zeros vs donated grid
Prints one JSON line per experiment.

Usage: timeout 3600 python scripts/scatter_lab3.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(fn, vals, *rest, iters=9, repeats=3):
    """Device seconds per fn(vals, *rest) call, chained-differencing.

    ``fn(vals, *rest) -> array``. The carry perturbs ``vals`` so XLA
    cannot hoist the call out of the loop.
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(2,))
    def chained(v, r, n):
        def body(i, carry):
            out = fn(carry, *r)
            dep = jnp.asarray(out).mean().astype(jnp.float32)
            return carry + (dep * 1e-9).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, v).sum()

    def timed(n):
        t0 = time.perf_counter()
        float(chained(vals, rest, n))
        return time.perf_counter() - t0

    timed(1)
    timed(iters)
    t1 = min(timed(1) for _ in range(repeats))
    tn = min(timed(iters) for _ in range(repeats))
    return max((tn - t1) / (iters - 1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
        ),
    )

    N, C = 2073600, 3
    G = 256 * 256 * 32
    rng = np.random.default_rng(0)

    # model-realistic coherent indices: smooth 1080p depth -> voxel path
    H, W = 1080, 1920
    base = rng.uniform(5.0, 40.0, size=(136, 241))
    try:
        from scipy.ndimage import zoom

        depth = zoom(base, (H / 136, W / 241), order=3)[:H, :W]
    except Exception:
        depth = np.kron(base, np.ones((8, 8)))[:H, :W]
    u, v = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = (v - W / 2) * depth / 1000.0
    y = (u - H / 2) * depth / 1000.0
    ijk = np.stack(
        [
            np.clip(depth / 50.0 * 256, 1, 255),
            np.clip(x / 25.0 * 128 + 128, 1, 255),
            np.clip(y / 10.0 * 16 + 16, 1, 31),
        ],
        -1,
    ).astype(np.int32)
    lin = ((ijk[..., 0] * 256 + ijk[..., 1]) * 32 + ijk[..., 2]).reshape(-1)[:N]
    runs = int((lin[1:] != lin[:-1]).sum()) + 1
    print(
        json.dumps(
            {
                "exp": "index_stats",
                "n": N,
                "unique": int(len(np.unique(lin))),
                "runs": runs,
                "run_compression": round(N / runs, 1),
            }
        ),
        flush=True,
    )

    vals = rng.uniform(size=(N, C)).astype(np.float32)
    lin_j = jnp.asarray(lin)
    vals_j = jnp.asarray(vals)

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

    # (a) baseline + N scaling
    def scatter(v, l):
        return jnp.zeros((G, C), v.dtype).at[l].add(v, mode="drop")

    t = chain_time(scatter, vals_j, lin_j)
    report("scatter_f32_flat", t)
    for div in (4, 16):
        t = chain_time(scatter, vals_j[: N // div], lin_j[: N // div])
        report(f"scatter_N_div{div}", t, rows=N // div)

    # vmap B=1 (the in-model form)
    t = chain_time(jax.vmap(scatter), vals_j[None], lin_j[None])
    report("scatter_vmap_B1", t)

    # (b) row width: one 96-wide row per point (z*class folded into row)
    # vs three-wide. Same row count.
    v96 = jnp.asarray(rng.uniform(size=(N, 96)).astype(np.float32))
    l65k = jnp.asarray((lin // 96).astype(np.int32))  # (i,j) cell index

    def scatter96(v, l):
        return jnp.zeros((G // 32, 96), v.dtype).at[l].add(v, mode="drop")

    t = chain_time(scatter96, v96, l65k)
    report("scatter_width96_65kbins", t)

    v1 = jnp.asarray(rng.uniform(size=(N, 1)).astype(np.float32))
    t = chain_time(
        lambda v, l: jnp.zeros((G, 1), v.dtype).at[l].add(v, mode="drop"),
        v1,
        lin_j,
    )
    report("scatter_width1", t)

    # (c) dropped rows: 15/16 OOB
    lin_drop = jnp.asarray(
        np.where(np.arange(N) % 16 == 0, lin, G + 5).astype(np.int32)
    )
    t = chain_time(scatter, vals_j, lin_drop)
    report("scatter_15of16_dropped", t, active=N // 16)

    # (d) sorted + flags
    order = np.argsort(lin, kind="stable")
    lin_s = jnp.asarray(lin[order])
    vals_s = jnp.asarray(vals[order])
    t = chain_time(scatter, vals_s, lin_s)
    report("scatter_sorted_noflag", t)

    def scatter_flags(v, l):
        z = jnp.zeros((G, C), v.dtype)
        return z.at[l].add(
            v, mode="drop", indices_are_sorted=True
        )

    t = chain_time(scatter_flags, vals_s, lin_s)
    report("scatter_sorted_flag", t)

    # unique indices: scatter only first-of-run rows, flags on
    first = np.concatenate([[True], lin[order][1:] != lin[order][:-1]])
    lin_u = jnp.asarray(np.where(first, lin[order], G + 5).astype(np.int32))

    def scatter_unique(v, l):
        z = jnp.zeros((G, C), v.dtype)
        return z.at[l].add(
            v, mode="drop", indices_are_sorted=True, unique_indices=True
        )

    t = chain_time(scatter_unique, vals_s, lin_u)
    report("scatter_sorted_unique_flags", t, active=int(first.sum()))

    # (f) set instead of add
    t = chain_time(
        lambda v, l: jnp.zeros((G, C), v.dtype).at[l].set(v, mode="drop"),
        vals_j,
        lin_j,
    )
    report("scatter_set", t)

    # (e) building blocks for the sort route
    t = chain_time(
        lambda v, l: jax.lax.sort(
            [l, v[:, 0], v[:, 1], v[:, 2]], num_keys=1
        )[1],
        vals_j,
        lin_j,
    )
    report("lax_sort_2M_1key_3payload", t)

    t = chain_time(lambda v: jnp.cumsum(v, axis=0), vals_j)
    report("cumsum_2Mx3", t)

    def gather(v, l):
        src = jnp.arange(G, dtype=v.dtype)[:, None] * (1 + v.mean() * 1e-9)
        return src[l].sum(0)

    t = chain_time(gather, vals_j, lin_j)
    report("gather_2M_rows", t)

    # (g) bf16 values
    t = chain_time(scatter, vals_j.astype(jnp.bfloat16), lin_j)
    report("scatter_bf16", t)


if __name__ == "__main__":
    main()
