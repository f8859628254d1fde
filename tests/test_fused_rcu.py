"""Fused RCU Pallas kernel vs XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccdpt_tpu.ops.fused_rcu import fused_rcu, xla_rcu


def _inputs(B=1, H=16, W=16, C=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)
    b1 = rng.standard_normal(C).astype(np.float32) * 0.1
    b2 = rng.standard_normal(C).astype(np.float32) * 0.1
    return map(jnp.asarray, (x, w1, b1, w2, b2))


def test_fused_rcu_matches_xla():
    x, w1, b1, w2, b2 = _inputs()
    got = fused_rcu(x, w1, b1, w2, b2, tile=(8, 8), interpret=True)
    want = xla_rcu(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_rcu_multi_tile_and_batch():
    x, w1, b1, w2, b2 = _inputs(B=2, H=24, W=16, C=16, seed=1)
    got = fused_rcu(x, w1, b1, w2, b2, tile=(8, 16), interpret=True)
    want = xla_rcu(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_rcu_border_zero_padding():
    # all-ones input exposes halo/padding mistakes at image borders
    C = 8
    x = jnp.ones((1, 8, 8, C), jnp.float32)
    w1 = jnp.ones((3, 3, C, C), jnp.float32) * 0.01
    w2 = jnp.ones((3, 3, C, C), jnp.float32) * 0.01
    b = jnp.zeros(C)
    got = fused_rcu(x, w1, b, w2, b, tile=(8, 8), interpret=True)
    want = xla_rcu(x, w1, b, w2, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
