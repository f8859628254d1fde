"""Fused fusion-block tail kernel vs XLA reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from soccdpt_tpu.ops.fused_fusion import fused_rcu_tail, xla_fusion_tail


def _inputs(B=1, H=16, W=16, C=32, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.standard_normal((B, H, W, C)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)
    b1 = rng.standard_normal(C).astype(np.float32) * 0.1
    b2 = rng.standard_normal(C).astype(np.float32) * 0.1
    wo = (rng.standard_normal((C, C)) * 0.05).astype(np.float32)
    bo = rng.standard_normal(C).astype(np.float32) * 0.1
    return map(jnp.asarray, (s, w1, b1, w2, b2, wo, bo))


def test_fused_tail_matches_xla():
    s, w1, b1, w2, b2, wo, bo = _inputs()
    got = fused_rcu_tail(s, w1, b1, w2, b2, wo, bo, tile=(8, 8), interpret=True)
    want = xla_fusion_tail(s, w1, b1, w2, b2, wo, bo)
    assert got.shape == (1, 32, 32, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_fused_tail_multi_tile_nonsquare():
    s, w1, b1, w2, b2, wo, bo = _inputs(B=2, H=24, W=16, C=16, seed=1)
    got = fused_rcu_tail(s, w1, b1, w2, b2, wo, bo, tile=(8, 16), interpret=True)
    want = xla_fusion_tail(s, w1, b1, w2, b2, wo, bo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_fused_tail_border_exact():
    C = 8
    s = jnp.ones((1, 8, 8, C), jnp.float32)
    w = jnp.ones((3, 3, C, C), jnp.float32) * 0.01
    wo = jnp.eye(C, dtype=jnp.float32) * 0.5
    b = jnp.zeros(C)
    got = fused_rcu_tail(s, w, b, w, b, wo, b, tile=(8, 8), interpret=True)
    want = xla_fusion_tail(s, w, b, w, b, wo, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
