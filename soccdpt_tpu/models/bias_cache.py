"""Bind-time folding of param-derived inference constants.

Several backbones derive attention-bias tensors from parameters alone —
Swin V2's CPB-MLP relative bias, BEiT's gathered relative-position
table, Swin v1's and LeViT's bias-table gathers. Under a chained/looped
jit XLA hoists these loop-invariant computations, but a single serving
dispatch pays them on every call: profiling the flagship forward showed
~1.2 ms of a 2.6 ms dispatch spent in these gathers (TPU gathers of
short rows run at <60 GB/s; see PERF.md "Single-dispatch latency").

The TPU-native fix is to fold them ONCE at weight-bind time: modules
route bias computations through :func:`cached_bias`, and
``build_inference_cache`` runs one forward with a mutable ``cache``
collection to materialize every bias. Serving then applies with the
``cache`` collection attached and each dispatch just reads the arrays.

Training never passes a ``cache`` collection, so biases are recomputed
inline there and gradients flow to the underlying parameters — the
cache is an inference-only artifact (stale-cache hazard: rebuild it
after any weight update).
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
from flax import linen as nn

Array = Any


# static model + static kwargs: repeated folds (one per eval round)
# reuse the same compiled executable instead of re-tracing a closure.
# NOTE: one executable per (model, shape) is retained; long-lived
# processes sweeping many distinct configs (multi-model serving) should
# call clear_fold_cache() between configs to bound the retained memory.
@functools.partial(jax.jit, static_argnums=(0, 3))
def _fold(model, v, x, kwargs_items):
    return model.apply(v, x, mutable=["cache"], **dict(kwargs_items))


def clear_fold_cache() -> None:
    """Drop every retained fold executable.

    ``_fold`` keeps one compiled executable per (model, input shape) for
    reuse across eval rounds; a process that binds many distinct model
    configs (a multi-model server, a timing sweep) accumulates them.
    Call this between configs — it clears only the fold cache, unlike
    the ``jax.clear_caches()`` sledgehammer.
    """
    _fold.clear_cache()


def cached_bias(mod: nn.Module, name: str, compute: Callable[[], Array]) -> Array:
    """Return ``compute()``, memoized in the module's ``cache`` collection.

    - cache collection supplied read-only (serving): return the stored
      value; the computation is skipped entirely.
    - cache collection mutable (``build_inference_cache``): compute,
      store, return.
    - no cache collection (training / plain apply): compute inline.
    - ``model.init``: compute inline, do NOT store — flax makes every
      collection mutable during init, so storing here would hand every
      caller of init a cache bound to the init-time params; replacing
      the params afterwards (torch import, checkpoint restore) would
      then silently serve stale biases.
    """
    if mod.is_initializing():
        return compute()
    if mod.has_variable("cache", name):
        return mod.get_variable("cache", name)
    value = compute()
    if mod.is_mutable_collection("cache"):
        mod.put_variable("cache", name, value)
    return value


def build_inference_cache(
    model, variables, example, cache_dtype=None, **apply_kwargs
):
    """Materialize every ``cached_bias`` value for fixed weights.

    Runs one (abstractly cheap) forward with ``mutable=["cache"]`` and
    returns ``variables`` with the populated ``cache`` collection
    attached. Rebuild after every weight update. Grid-dependent biases
    (BEiT) are keyed by grid size, so a cache built at one input
    resolution is simply ignored at another.

    ``cache_dtype`` (e.g. ``jnp.bfloat16``) stores the folded biases in
    a narrower dtype — halves the per-layer bias reads that dominate
    BEiT-512 serving (PERF.md), at a ~0.4% relative perturbation of the
    pre-softmax logits. Opt-in: parity-exact serving keeps the default.
    """
    # Drop any pre-existing cache first: cached_bias short-circuits on
    # present entries, so folding over a stale cache would return it
    # unchanged instead of recomputing from the CURRENT params.
    variables = {k: v for k, v in variables.items() if k != "cache"}
    try:
        _, mutated = _fold(
            model, variables, example, tuple(sorted(apply_kwargs.items()))
        )
    except TypeError:
        # Unhashable kwarg values (rngs dicts, arrays) can't ride the
        # static-args executable cache; fall back to a one-off closure
        # jit for those callers.
        _, mutated = jax.jit(
            lambda v, x: model.apply(v, x, mutable=["cache"], **apply_kwargs)
        )(variables, example)
    # Backbones without param-derived biases (Next-ViT, hybrid, ...)
    # write nothing; flax then omits the collection entirely.
    cache = mutated.get("cache") if hasattr(mutated, "get") else None
    if not cache:
        return variables
    if cache_dtype is not None:
        cache = jax.tree_util.tree_map(
            lambda a: a.astype(cache_dtype), cache
        )
    return {**variables, "cache": cache}
