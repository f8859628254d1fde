"""Structural parameter initialization without compilation.

``jax.eval_shape`` traces ``model.init`` (no compute, no compile) and
the shapes are filled with small host-side random values — exact values
are irrelevant for compile checks and throughput benchmarking, and this
avoids minutes of eager init through a tunneled device.
"""
from __future__ import annotations

import numpy as np


def structural_init(model, example, **kwargs):
    import jax

    shapes = jax.eval_shape(
        lambda rng: model.init(rng, example, **kwargs), jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(0)

    def fill(s):
        return np.asarray(rng.standard_normal(s.shape) * 0.02, dtype=s.dtype)

    return jax.tree_util.tree_map(fill, shapes)
