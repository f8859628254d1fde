"""Device mesh + sharding helpers.

The reference is single-process/single-GPU (SURVEY.md §2.5: no
torch.distributed anywhere). Here parallelism is a first-class component:
a ``jax.sharding.Mesh`` over the chips, batch sharded on the ``data``
axis, optional ``model`` axis for tensor-parallel weight sharding. XLA
inserts the collectives (psum for grad all-reduce) over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axes: Tuple[str, ...] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh. Default: all local devices on a 1-D ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
        axes = axes[:1]
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axes)


def mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """1-D data mesh over the largest device count that divides the
    global batch (single-host convenience)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(shape=(n,), devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape.get(DATA_AXIS, 1)
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {n}"
        )
    return global_batch // n


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays with the batch dim sharded on ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
