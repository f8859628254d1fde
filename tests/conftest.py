"""Test configuration: force CPU with 8 virtual devices.

Multi-device tests exercise the pjit/shard_map mesh without TPU hardware,
mirroring SURVEY.md §4's plan (multi-device-on-CPU via
``--xla_force_host_platform_device_count``). Must run before jax import.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
