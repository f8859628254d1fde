"""Parity tests for the flash global-attention kernel
(ops/global_attention.py) against the plain-XLA path, interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccdpt_tpu.ops.global_attention import flash_mha, xla_reference


def _mk(B, H, T, d, bias=True, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, T, d)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, T, d)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, T, d)), dtype)
    b = (
        jnp.asarray(rng.standard_normal((H, T, T)), jnp.float32)
        if bias
        else None
    )
    return q, k, v, b


@pytest.mark.parametrize(
    "B,H,T,d,bias",
    [
        (1, 2, 128, 32, True),    # aligned, with bias
        (1, 2, 128, 32, False),   # aligned, no bias (plain ViT)
        (2, 2, 65, 16, True),     # cls token -> odd T, needs padding
        (1, 3, 257, 64, True),    # multi-block queries + padding
    ],
)
def test_flash_matches_xla(B, H, T, d, bias):
    q, k, v, b = _mk(B, H, T, d, bias)
    scale = d**-0.5
    want = xla_reference(q, k, v, b, scale)
    got = flash_mha(q, k, v, b, scale=scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_flash_bf16():
    q, k, v, b = _mk(1, 2, 130, 32, True, dtype=jnp.bfloat16)
    scale = 32**-0.5
    want = xla_reference(q, k, v, b, scale)
    got = flash_mha(q, k, v, b, scale=scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("backward", ["xla", "pallas"])
def test_flash_gradients_match_xla(backward):
    """Both custom-VJP strategies (XLA recompute and the Pallas
    backward kernel) must produce the same cotangents as differentiating
    the XLA path directly — incl. the bias (BEiT's rel-pos table
    trains)."""
    q, k, v, b = _mk(1, 2, 65, 16, True)
    scale = 16**-0.5

    def loss_flash(q, k, v, b):
        return flash_mha(
            q, k, v, b, scale=scale, interpret=True, backward=backward
        ).sum()

    def loss_xla(q, k, v, b):
        return xla_reference(q, k, v, b, scale).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, b)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, b)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=2e-5, rtol=2e-5
        )


@pytest.mark.parametrize(
    "B,H,T,d,bias",
    [
        (1, 2, 128, 32, True),    # aligned, single query block
        (1, 2, 128, 32, False),   # no bias (plain ViT)
        (2, 2, 65, 16, True),     # padding + batch>1 (dbias sums over b)
        (1, 3, 257, 64, True),    # multi-block queries: dk/dv accumulate
        (3, 2, 260, 32, False),   # multi-block + batch, no bias
    ],
)
def test_flash_pallas_backward_matches_xla_backward(B, H, T, d, bias):
    """The Pallas dq/dk/dv(/dbias) kernel vs the XLA-recompute VJP on a
    non-trivial cotangent (weighted sum, so g varies per element)."""
    q, k, v, b = _mk(B, H, T, d, bias, seed=3)
    scale = d**-0.5
    w = jnp.asarray(
        np.random.default_rng(5).standard_normal((B, H, T, d)), jnp.float32
    )

    def loss(backward):
        def fn(*args):
            return (
                flash_mha(
                    *args, scale=scale, interpret=True, backward=backward
                ) * w
            ).sum()
        return fn

    argnums = (0, 1, 2, 3) if bias else (0, 1, 2)
    args = (q, k, v, b) if bias else (q, k, v)
    g_pal = jax.grad(loss("pallas"), argnums=argnums)(*args)
    g_xla = jax.grad(loss("xla"), argnums=argnums)(*args)
    names = ["dq", "dk", "dv", "dbias"]
    for name, gp, gx in zip(names, g_pal, g_xla):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=3e-5, rtol=3e-5,
            err_msg=f"{name} B={B} H={H} T={T} d={d} bias={bias}",
        )


def test_beit_backbone_pallas_matches_xla():
    """End-to-end: the BEiT test backbone with use_pallas gives the same
    features as the einsum path."""
    from soccdpt_tpu.models.backbones import make_backbone

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    f_ref, _ = make_backbone("beittest_64")
    f_pal, _ = make_backbone("beittest_64", use_pallas=True)
    m_ref, m_pal = f_ref(), f_pal()
    variables = m_ref.init(jax.random.PRNGKey(0), x, deterministic=True)
    want = m_ref.apply(variables, x, deterministic=True)
    got = m_pal.apply(variables, x, deterministic=True)
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), atol=5e-4, rtol=5e-4
        )


def test_beit_backbone_pallas_gradients_match_xla():
    """Training through the flash path: gradients w.r.t. params of the
    BEiT test backbone match the einsum path (the custom VJP recomputes
    with XLA, so this pins the whole module wiring, not just the
    kernel)."""
    from soccdpt_tpu.models.backbones import make_backbone

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    f_ref, _ = make_backbone("beittest_64")
    f_pal, _ = make_backbone("beittest_64", use_pallas=True)
    m_ref, m_pal = f_ref(), f_pal()
    variables = m_ref.init(jax.random.PRNGKey(0), x, deterministic=True)

    def loss(model):
        def fn(params):
            feats = model.apply(
                {**variables, "params": params}, x, deterministic=True
            )
            return sum(f.astype(jnp.float32).sum() for f in feats)
        return fn

    g_ref = jax.grad(loss(m_ref))(variables["params"])
    g_pal = jax.grad(loss(m_pal))(variables["params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
        )
