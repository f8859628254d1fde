#!/usr/bin/env python
"""Micro-bench: fused depth-head tail kernel vs XLA at the flagship
shape (ops/fused_head.py). Chained-jit protocol."""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soccdpt_tpu.ops.fused_head import fused_head_tail, xla_head_tail

    B, H, W, Ci, Cm = 1, 128, 128, 128, 32
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), dt)
    w2 = jnp.asarray(rng.standard_normal((3, 3, Ci, Cm)) * 0.1, dt)
    b2 = jnp.asarray(rng.standard_normal((Cm,)) * 0.1, dt)
    w3 = jnp.asarray(rng.standard_normal((Cm,)) * 0.1, dt)
    b3 = jnp.asarray(rng.standard_normal(()), dt)

    for tile in [(8, 64), (8, 128), (16, 64), (4, 128)]:
        for name in ["xla", "pallas"]:
            if name == "xla" and tile != (8, 64):
                continue

            @partial(jax.jit, static_argnums=(1,))
            def chained(inp, n):
                def body(i, c):
                    if name == "xla":
                        o = xla_head_tail(c, w2, b2, w3, b3)
                    else:
                        o = fused_head_tail(c, w2, b2, w3, b3, tile=tile)
                    return c + (o.mean() * 1e-9).astype(c.dtype)

                return jax.lax.fori_loop(0, n, body, inp).sum()

            def timed(n):
                t0 = time.perf_counter()
                float(chained(x, n))
                return time.perf_counter() - t0

            try:
                timed(1); timed(101)
                t1 = min(timed(1) for _ in range(3))
                tn = min(timed(101) for _ in range(3))
                us = (tn - t1) / 100 * 1e6
                print(f"{name:7s} tile={tile}: {us:8.1f} us", flush=True)
            except Exception as e:
                print(f"{name:7s} tile={tile}: FAIL {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
