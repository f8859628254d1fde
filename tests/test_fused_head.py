"""Parity tests for the fused depth-head tail kernel (ops/fused_head.py)
vs the XLA path and the actual DepthHead module, interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccdpt_tpu.ops.fused_head import (
    fused_head_tail,
    xla_head_tail,
)


def _mk(B, H, W, Ci, Cm, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), dtype)
    w2 = jnp.asarray(rng.standard_normal((3, 3, Ci, Cm)) * 0.1, dtype)
    b2 = jnp.asarray(rng.standard_normal((Cm,)) * 0.1, dtype)
    w3 = jnp.asarray(rng.standard_normal((Cm,)) * 0.1, dtype)
    b3 = jnp.asarray(rng.standard_normal(()), dtype)
    return x, w2, b2, w3, b3


@pytest.mark.parametrize(
    "B,H,W,Ci,Cm,tile",
    [
        (1, 16, 16, 8, 8, None),
        (2, 16, 32, 16, 8, (8, 16)),
        (1, 8, 8, 8, 16, (4, 8)),  # edge-heavy: 2x2 tiles
    ],
)
def test_fused_head_tail_matches_xla(B, H, W, Ci, Cm, tile):
    x, w2, b2, w3, b3 = _mk(B, H, W, Ci, Cm)
    want = xla_head_tail(x, w2, b2, w3, b3)
    got = fused_head_tail(x, w2, b2, w3, b3, tile=tile, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_fused_head_tail_matches_depth_head_module():
    """The kernel must reproduce the DepthHead module's tail exactly:
    same upsample semantics (torch-exact ac=True), same relu chain."""
    from soccdpt_tpu.models.heads import DepthHead

    B, H, W, F = 1, 16, 16, 16
    head = DepthHead(head_features_1=F, head_features_2=8)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, H, W, F)), jnp.float32
    )
    variables = head.init(jax.random.PRNGKey(0), x)
    want = head.apply(variables, x)  # (B, 2H, 2W, 1)

    p = variables["params"]
    # conv1 runs before the tail; replicate it, then the kernel
    mid = jax.lax.conv_general_dilated(
        x, p["conv1"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv1"]["bias"]
    got = fused_head_tail(
        mid,
        p["conv2"]["kernel"], p["conv2"]["bias"],
        p["conv3"]["kernel"], p["conv3"]["bias"],
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want[..., 0]), atol=2e-5, rtol=2e-5
    )


def test_fused_head_tail_gradients():
    x, w2, b2, w3, b3 = _mk(1, 8, 8, 8, 8)

    def loss_pallas(*args):
        return fused_head_tail(*args, tile=(4, 8), interpret=True).sum()

    def loss_xla(*args):
        return xla_head_tail(*args).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, w2, b2, w3, b3)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w2, b2, w3, b3)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )
