"""Debug/determinism toggles (SURVEY.md §5.2).

The reference's nearest equivalents: seeded determinism
(reference train_SOccDPT.py:150-154) and NaN/Inf scrubbing in metrics.
Here: ``enable_nan_checks`` turns on jax.debug_nans (fails fast on any
NaN produced under jit), and ``set_determinism`` seeds everything and
enables deterministic XLA reductions. JAX's functional model already
removes the reference's global-hook-dict race (SURVEY.md §2.6).
"""
from __future__ import annotations

import os
import random


def enable_nan_checks(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


def set_determinism(seed: int = 0) -> None:
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("XLA_FLAGS", "")
    if "--xla_gpu_deterministic_ops" not in os.environ["XLA_FLAGS"]:
        # TPU reductions are deterministic by default; flag kept for
        # CPU/GPU parity runs.
        os.environ["XLA_FLAGS"] += " --xla_cpu_enable_fast_math=false"


def tree_finite_report(tree) -> dict:
    """Count non-finite values per leaf (debugging aid)."""
    import jax
    import numpy as np

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        a = np.asarray(leaf)
        bad = int((~np.isfinite(a)).sum())
        if bad:
            out[jax.tree_util.keystr(path)] = bad
    return out
