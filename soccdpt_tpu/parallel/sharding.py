"""Parameter/batch partition rules over the device mesh.

The model is ~40-340 M params (reference loader.py:126-130), so data
parallelism is the production strategy (SURVEY.md §2.5); the ``model``
axis exists so tensor parallelism can be layered on for the larger
backbones: weight matrices with a dimension divisible by the tp size are
sharded on their largest eligible dim, and XLA's SPMD partitioner
inserts the all-gathers/reduce-scatters over ICI.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

PyTree = Any


def param_sharding_rules(
    params: PyTree,
    mesh: Mesh,
    min_size: int = 2**16,
) -> PyTree:
    """NamedSharding tree for params: replicate small leaves, shard the
    largest tp-divisible dim of large matrices over ``model``."""
    tp = mesh.shape.get(MODEL_AXIS, 1)

    def rule(leaf):
        # works on concrete arrays AND abstract ShapeDtypeStructs, so
        # the flagship sharding summary can run via jax.eval_shape
        shape = leaf.shape if hasattr(leaf, "shape") else np.shape(leaf)
        if tp > 1 and np.prod(shape, dtype=np.int64) >= min_size:
            # shard the largest dim divisible by tp
            order = sorted(
                range(len(shape)), key=lambda i: shape[i], reverse=True
            )
            for dim in order:
                if shape[dim] % tp == 0 and shape[dim] >= tp:
                    spec = [None] * len(shape)
                    spec[dim] = MODEL_AXIS
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def batch_sharding_rules(batch: PyTree, mesh: Mesh) -> PyTree:
    """Batch dim on ``data``; replicated over ``model``."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(DATA_AXIS)), batch
    )


def shard_params(params: PyTree, mesh: Mesh) -> PyTree:
    shardings = param_sharding_rules(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
