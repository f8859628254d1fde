"""Benchmark entry point (driver-facing).

Delegates to soccdpt_tpu.cli.bench; prints ONE JSON line. The compile
cache lives at <repo>/.jax_cache so warm runs take ~3 minutes.
"""
import os

os.environ.setdefault(
    "SOCCDPT_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

from soccdpt_tpu.cli.bench import main

if __name__ == "__main__":
    main()
