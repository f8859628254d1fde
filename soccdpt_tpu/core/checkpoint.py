"""Checkpoint save/restore (orbax) + reference-layout paths.

Replaces the reference's per-epoch ``torch.save(state_dict)``
(reference train_SOccDPT.py:437-449) and ``BaseModel.load_net``
(base_model.py:4-46). Checkpoints carry params, batch_stats, opt_state
and step; restore is shape-checked. Torch ``.pth``/``.pt`` ingestion
lives in core/torch_import.py.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

PyTree = Any


def checkpoint_dir(
    base_dir: str, project_name: str, run_id: str
) -> str:
    """reference layout: checkpoints/<project>/<run_id>/ (train_SOccDPT.py:438)."""
    return os.path.join(base_dir, project_name, run_id)


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, state: Dict[str, PyTree]) -> None:
    """Save a pytree dict (params / batch_stats / opt_state / step).

    Arrays are handed to orbax as-is — NO host gather: device_get on a
    tp-sharded tree would materialize every full array on one host and
    defeat sharded/multi-host checkpointing; orbax writes global arrays
    from their shards directly. Restore side is topology-free (host
    arrays), re-placed onto the target mesh by
    ``Trainer.reshard_state``."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, target: Optional[Dict[str, PyTree]] = None):
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            # Topology-free restore: pull every leaf back as a host numpy
            # array (placement onto a mesh is the caller's job —
            # Trainer.reshard_state). A bare restore() would try to
            # rebuild jax.Arrays with the *saved* sharding, which fails
            # across backends (e.g. CPU-saved checkpoint in a TPU
            # process) and across mesh topologies.
            meta = ckptr.metadata(path).item_metadata
            tree = meta.tree if hasattr(meta, "tree") else meta
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
            )
            return ckptr.restore(path, restore_args=restore_args)
        restored = ckptr.restore(path, item=jax.device_get(target))
        return restored


def load_params_lenient(
    restored_params: PyTree, target_params: PyTree, verbose: bool = True
) -> PyTree:
    """strict=False-style merge (reference base_model.py:22-37): copy
    leaves whose path+shape match the target, keep target leaves
    otherwise, and report incompatibilities."""
    flat_t = dict(jax.tree_util.tree_leaves_with_path(target_params))
    flat_r = dict(jax.tree_util.tree_leaves_with_path(restored_params))
    merged = {}
    skipped = []
    for path, tgt in flat_t.items():
        src = flat_r.get(path)
        if src is not None and np.shape(src) == np.shape(tgt):
            merged[path] = src
        else:
            merged[path] = tgt
            skipped.append(jax.tree_util.keystr(path))
    if verbose and skipped:
        print(f"[checkpoint] kept {len(skipped)} incompatible/missing leaves:")
        for s in skipped[:20]:
            print("  ", s)
    treedef = jax.tree_util.tree_structure(target_params)
    leaves = [merged[p] for p, _ in jax.tree_util.tree_leaves_with_path(target_params)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
