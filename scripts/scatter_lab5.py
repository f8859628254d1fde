#!/usr/bin/env python
"""Scatter lab 5: why is the IN-MODEL sort 50 ms when lab3 said 3.7 ms?

profile_step --what occ attributes 50.4 ms (0.5 GB/s) to the vmapped
4-operand lax.sort, vs lab3's 3.7 ms for the same shapes. Two candidate
deltas: (a) lab3's key was loop-invariant (the chain perturbed the
payload only) so XLA may have taken a cheaper path; (b) the in-model
sort is under vmap (B=1) and batched sorts may hit a slower lowering.

Also times the decomposition candidates: 2-operand argsort + payload
gathers, and 1-operand sort.

Usage: timeout 3600 python scripts/scatter_lab5.py
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
    lin_f = jnp.asarray(rng.integers(1, G, size=(N,)).astype(np.float32))
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

    # The carry is the KEY (float, perturbed each iter -> int32 cast),
    # payloads constant: the honest in-model situation (key varies).
    def sort4(kf, v):
        k = kf.astype(jnp.int32)
        return jax.lax.sort(
            [k, v[:, 0], v[:, 1], v[:, 2]], num_keys=1
        )[1]

    report("sort4_varying_key", chain_time(sort4, lin_f, vals))

    def sort2_iota(kf):
        k = kf.astype(jnp.int32)
        return jax.lax.sort(
            [k, jnp.arange(N, dtype=jnp.int32)], num_keys=1
        )[1].astype(jnp.float32)

    report("sort2_key_iota_varying", chain_time(sort2_iota, lin_f))

    def sort1(kf):
        return jax.lax.sort([kf.astype(jnp.int32)], num_keys=1)[0].astype(
            jnp.float32
        )

    report("sort1_varying_key", chain_time(sort1, lin_f))

    # full argsort+gather decomposition: 2-op sort, then 3 row gathers
    def argsort_gather(kf, v):
        k = kf.astype(jnp.int32)
        ks, order = jax.lax.sort(
            [k, jnp.arange(N, dtype=jnp.int32)], num_keys=1
        )
        return jnp.take(v, order, axis=0) + ks[:, None] * 1e-12

    report("argsort_plus_gatherN_w3", chain_time(argsort_gather, lin_f, vals))

    # vmapped variants (B=1) - the in-model shape
    def sort4_vmap(kf, v):
        def one(k1, v1):
            k = k1.astype(jnp.int32)
            return jax.lax.sort(
                [k, v1[:, 0], v1[:, 1], v1[:, 2]], num_keys=1
            )[1]

        return jax.vmap(one)(kf[None], v[None])[0]

    report("sort4_vmapB1_varying_key", chain_time(sort4_vmap, lin_f, vals))

    # lab3's original framing: key CONSTANT, payload perturbed
    lin_i = lin_f.astype(jnp.int32)

    def sort4_constkey(v, l):
        return jax.lax.sort([l, v[:, 0], v[:, 1], v[:, 2]], num_keys=1)[1]

    report("sort4_const_key_lab3", chain_time(sort4_constkey, vals, lin_i))

    # f32 key vs int key
    def sort4_f32key(kf, v):
        return jax.lax.sort(
            [kf, v[:, 0], v[:, 1], v[:, 2]], num_keys=1
        )[1]

    report("sort4_f32_key", chain_time(sort4_f32key, lin_f, vals))

    # associative_scan segmented-add at (N,3), the in-model scan
    flags = jnp.asarray(rng.integers(0, 2, size=(N,)).astype(bool))

    def segscan(v, f):
        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, vb + jnp.where(fb[..., None], 0.0, va)

        return jax.lax.associative_scan(comb, (f, v), axis=0)[1]

    report("segscan_2Mx3", chain_time(segscan, vals, flags))


if __name__ == "__main__":
    main()
