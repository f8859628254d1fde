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


@pytest.mark.parametrize("with_mask", [False, True])
def test_batched_kernel_matches_xla(with_mask):
    """G-windows-per-program kernel parity (grid batching + per-block
    mask alignment)."""
    from soccdpt_tpu.ops.window_attention import (
        cosine_window_attention_batched,
    )

    (q, k, v, scale, bias), mask = _inputs(
        Bw=16, H=2, N=64, d=32, with_mask=with_mask, nW=8
    )
    got = cosine_window_attention_batched(
        q, k, v, scale, bias, mask, interpret=True
    )
    want = xla_reference(q, k, v, scale, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_batched_kernel_group_fallback():
    """Window counts that defeat grouping fall back to the per-window
    kernel (still correct)."""
    from soccdpt_tpu.ops.window_attention import (
        cosine_window_attention_batched,
    )

    (q, k, v, scale, bias), mask = _inputs(
        Bw=6, H=2, N=64, d=32, with_mask=True, nW=3
    )
    got = cosine_window_attention_batched(
        q, k, v, scale, bias, mask, interpret=True
    )
    want = xla_reference(q, k, v, scale, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_pallas_attention_gradients_match_xla(with_mask):
    """The custom VJP (Pallas forward, XLA-recompute backward) produces
    the same gradients as differentiating the XLA path — including for
    scale and bias (the CPB-MLP path needs them)."""
    from soccdpt_tpu.ops.window_attention import pallas_window_attention

    (q, k, v, scale, bias), mask = _inputs(
        Bw=8, H=2, N=64, d=32, with_mask=with_mask, nW=4
    )

    def loss_pallas(q, k, v, scale, bias):
        out = pallas_window_attention(
            q, k, v, scale, bias, mask, interpret=True
        )
        return jnp.sum(out * out)

    def loss_xla(q, k, v, scale, bias):
        out = xla_reference(q, k, v, scale, bias, mask)
        return jnp.sum(out * out)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(q, k, v, scale, bias)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, scale, bias)
    for a, b, name in zip(g_p, g_x, ("q", "k", "v", "scale", "bias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4, err_msg=name
        )


@pytest.mark.slow  # retired opt-in kernel (PERF.md); 39 s of the fast lane
def test_backbone_pallas_training_gradients():
    """use_pallas now composes with jax.grad (the round-1 trainer guard
    is gone): gradients through a Pallas-attention backbone are finite
    and close to the XLA path's."""
    from soccdpt_tpu.models.backbones.swin2 import SWIN2_CONFIGS, SwinV2Backbone

    cfg = SWIN2_CONFIGS["swin2test_64"]
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32
    )

    grads = {}
    for use_pallas in (False, True):
        bb = SwinV2Backbone(cfg=cfg, hooks=(1, 1, 1, 1), use_pallas=use_pallas)
        variables = bb.init(jax.random.PRNGKey(0), x)

        def loss(params):
            feats = bb.apply({"params": params}, x, deterministic=True)
            return sum(jnp.sum(f * f) for f in feats)

        grads[use_pallas] = jax.grad(loss)(variables["params"])

    leaves_x = jax.tree_util.tree_leaves(grads[False])
    leaves_p = jax.tree_util.tree_leaves(grads[True])
    for a, b in zip(leaves_x, leaves_p):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        # per-leaf scale-relative tolerance: near-zero elements inside a
        # large-magnitude leaf are pure float noise
        np.testing.assert_allclose(a, b, atol=1e-4 * (np.abs(a).max() + 1e-9))
