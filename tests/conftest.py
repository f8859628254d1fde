"""Test configuration: force CPU with 8 virtual devices.

Multi-device tests exercise the pjit/shard_map mesh without TPU hardware
(SURVEY.md §4: multi-device-on-CPU). The environment pins
``JAX_PLATFORMS=axon`` (real TPU via tunnel) and jax may already be
imported by a pytest plugin, so env vars are not enough — use
``jax.config.update``, which takes effect as long as no backend has been
initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent jit compilation cache: the suite is dominated by CPU jit
# compiles (~25 min cold for the training/backbones/cli/model_types
# files); warm runs reuse compiled executables from disk.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402

# Fast/slow lanes (single-core CI budget): the default run must finish
# inside a ~10-minute window, so the heavyweight whole-trunk parity and
# TP-equivalence tests are opt-in via RUN_SLOW=1 (or --slow). The fast
# lane still covers every module (piece-level parity, semantics,
# kernels); the slow lane re-verifies whole-model composition.


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run tests marked slow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow lane: RUN_SLOW=1 or --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
