"""Pallas window-attention kernel vs XLA reference parity (interpret
mode on CPU; the compiled kernel runs in bench.py on real TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccdpt_tpu.ops.window_attention import (
    cosine_window_attention,
    xla_reference,
)


def _inputs(Bw=8, H=3, N=64, d=32, seed=0, with_mask=False, nW=4):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((Bw, H, N, d)).astype(np.float32)
    k = rng.standard_normal((Bw, H, N, d)).astype(np.float32)
    v = rng.standard_normal((Bw, H, N, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    scale = np.exp(rng.standard_normal((H, 1, 1))).astype(np.float32)
    bias = rng.standard_normal((H, N, N)).astype(np.float32)
    mask = None
    if with_mask:
        mask = np.where(
            rng.random((nW, N, N)) > 0.8, -100.0, 0.0
        ).astype(np.float32)
    return map(jnp.asarray, (q, k, v, scale, bias)), (
        jnp.asarray(mask) if mask is not None else None
    )


def test_kernel_matches_xla_unmasked():
    (q, k, v, scale, bias), _ = _inputs()
    got = cosine_window_attention(q, k, v, scale, bias, interpret=True)
    want = xla_reference(q, k, v, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_matches_xla_masked():
    (q, k, v, scale, bias), mask = _inputs(with_mask=True)
    got = cosine_window_attention(q, k, v, scale, bias, mask, interpret=True)
    want = xla_reference(q, k, v, scale, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_bf16_io():
    (q, k, v, scale, bias), _ = _inputs(Bw=4, N=64)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = cosine_window_attention(q, k, v, scale, bias, interpret=True)
    want = xla_reference(q, k, v, scale, bias)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05
    )


def test_backbone_pallas_path_matches_xla():
    """Full Swin2 backbone with use_pallas vs without (interpret mode)."""
    from soccdpt_tpu.models.backbones.swin2 import make_swin2_backbone

    f_xla, _ = make_swin2_backbone("swin2test_64")
    f_pls, _ = make_swin2_backbone("swin2test_64", use_pallas=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    m_xla = f_xla()
    m_pls = f_pls()
    vars_ = m_xla.init(jax.random.PRNGKey(0), x)
    out_xla = m_xla.apply(vars_, x)
    out_pls = m_pls.apply(vars_, x)
    for a, b in zip(out_xla, out_pls):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )
