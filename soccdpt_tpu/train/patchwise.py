"""Patch-wise (parameter-subset) training, reformulated for JAX.

The reference mutates ``requires_grad`` over torch parameters
(reference patchwise_training/__init__.py:148-252, ``PatchWiseInplace``:
each inner step unfreezes the next ``M = ceil(N * pct)`` of the N
trainable parameters and runs a full fwd/bwd/step). requires_grad does
not exist in JAX; the same memory intent — bound the autograd graph to a
parameter subset — is achieved by wrapping frozen leaves in
``stop_gradient`` inside the loss (autodiff then treats them as
constants and prunes their backward graph), optionally combined with
``jax.checkpoint`` on backbone stages (SURVEY.md §7.3 risk #3).

Masks are boolean pytrees matching ``params``. Leaf enumeration order is
the sorted flax path order, mirroring torch's ``model.parameters()``
enumeration semantics (reference utils/__init__.py:51-62).
"""
from __future__ import annotations

import math
from typing import Any, List

import jax
import jax.numpy as jnp

PyTree = Any


def _flatten(params: PyTree):
    return jax.tree_util.tree_flatten(params)


def tree_mask_like(params: PyTree, value: bool = True) -> PyTree:
    return jax.tree_util.tree_map(lambda _: value, params)


def _path_contains(path, names) -> bool:
    for part in path:
        key = getattr(part, "key", getattr(part, "name", None))
        if key is not None and any(n in str(key) for n in names):
            return True
    return False


# Submodule names that constitute "the pretrained encoder" for freezing
# purposes (reference freeze_pretrained_encoder freezes
# ``model.pretrained`` — the timm backbone; utils/__init__.py:46-48).
ENCODER_SUBTREES = ("backbone", "pretrained")


def encoder_mask(
    params: PyTree, encoder_percentage: float, subtrees=ENCODER_SUBTREES
) -> PyTree:
    """Trainability mask: non-encoder leaves all trainable; the first
    ``round(N * pct)`` encoder leaves (enumeration order) trainable, the
    rest frozen (reference unfreeze_pretrained_encoder_by_percentage,
    utils/__init__.py:51-62)."""
    assert 0.0 <= encoder_percentage <= 1.0
    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    enc_indices = [
        i for i, (p, _) in enumerate(paths) if _path_contains(p, subtrees)
    ]
    n = len(enc_indices)
    m = round(n * encoder_percentage)
    unfrozen = set(enc_indices[:m])
    flags = [
        (i in unfrozen) if i in set(enc_indices) else True
        for i in range(len(paths))
    ]
    return jax.tree_util.tree_unflatten(treedef, flags)


def patch_masks(trainable: PyTree, patchwise_percentage: float) -> List[PyTree]:
    """Split the trainable leaves into ceil(1/pct) disjoint patch masks
    (reference PatchWiseInplace.__init__/__next__,
    patchwise_training/__init__.py:193-246)."""
    assert 0.0 < patchwise_percentage <= 1.0
    flags, treedef = _flatten(trainable)
    train_idx = [i for i, f in enumerate(flags) if f]
    n = len(train_idx)
    if n == 0:
        raise ValueError("no trainable parameters")
    m = min(math.ceil(n * patchwise_percentage), n)
    masks = []
    for start in range(0, n, m):
        active = set(train_idx[start : start + m])
        masks.append(
            jax.tree_util.tree_unflatten(
                treedef, [i in active for i in range(len(flags))]
            )
        )
    return masks


def select_trainable(params: PyTree, mask: PyTree) -> PyTree:
    """stop_gradient on frozen leaves — the JAX analogue of
    requires_grad=False. Use inside the loss closure."""
    return jax.tree_util.tree_map(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask
    )


def zero_frozen_grads(grads: PyTree, mask: PyTree) -> PyTree:
    """Explicitly zero grads of frozen leaves (they are already zero
    from stop_gradient; this guards optimizer statistics)."""
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask
    )


def mask_fraction(mask: PyTree) -> float:
    flags = _flatten(mask)[0]
    return sum(bool(f) for f in flags) / max(len(flags), 1)
