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

assert jax.devices()[0].platform == "cpu", jax.devices()
