"""Device timing helpers (SURVEY.md §5.1).

The reference times FPS with wall-clock loops / CUDA events
(reference eval_timing.py:6-29). On TPU through the axon tunnel,
``block_until_ready`` is unreliable and per-dispatch RTT dominates, so
``measure_forward_hz`` chains N forwards inside a single jit with a data
dependency and differences two chain lengths (see bench.py).
``jax.profiler`` tracing is exposed via ``trace`` for real kernel-level
timing.
"""
from __future__ import annotations

import contextlib
import time
from functools import partial
from typing import Callable, Tuple


def measure_forward_hz(
    apply_fn: Callable,
    example_input,
    batch: int,
    n_iters: int = 21,
    repeats: int = 3,
    params=None,
) -> Tuple[float, float]:
    """Returns (hz, seconds_per_forward).

    ``apply_fn(x) -> array`` (or ``apply_fn(params, x)`` when ``params``
    is given) must return something reducible to a scalar-dependency.

    Pass large weight trees via ``params`` — NOT closed over inside
    ``apply_fn``. Closed-over host arrays are baked into the lowered
    module as HLO constants; at 200M-param sizes that overflows the
    remote-compile transport (HTTP 413 through the axon tunnel) and
    bloats every compile (jax's captured-constants hazard).
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(2,))
    def chained(p, inp, n):
        def body(i, carry):
            out = apply_fn(carry) if p is None else apply_fn(p, carry)
            # depend on EVERY output, else XLA dead-code eliminates the
            # untouched ones and the measurement lies
            leaves = [
                jnp.asarray(o).mean().astype(jnp.float32)
                for o in jax.tree_util.tree_leaves(out)
                if o is not None
            ]
            dep = sum(leaves[1:], leaves[0])
            return carry + (dep * 1e-9).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, inp).sum()

    def timed(n):
        t0 = time.perf_counter()
        float(chained(params, example_input, n))
        return time.perf_counter() - t0

    timed(1)
    timed(n_iters)
    t1 = min(timed(1) for _ in range(repeats))
    tn = min(timed(n_iters) for _ in range(repeats))
    per_forward = max((tn - t1) / (n_iters - 1), 1e-9)
    return batch / per_forward, per_forward


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time tracker for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last = None

    def tick(self) -> float:
        now = time.perf_counter()
        dt = 0.0
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0
