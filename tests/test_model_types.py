"""Every real model type in the registry must structurally build
(jax.eval_shape: trace only, no compute) — the 11-way dispatch of the
reference loader (reference loader.py:37-124)."""
import jax
import jax.numpy as jnp
import pytest

from soccdpt_tpu.core.config import MODEL_TYPES, ModelConfig
from soccdpt_tpu.models.soccdpt import build_model

REAL_TYPES = [
    "dpt_beit_large_512",
    "dpt_beit_large_384",
    "dpt_beit_base_384",
    "dpt_swin2_large_384",
    "dpt_swin2_base_384",
    "dpt_swin2_tiny_256",
    "dpt_swin_large_384",
    "dpt_next_vit_large_384",
    "dpt_levit_224",
    "dpt_large_384",
    "dpt_hybrid_384",
]


@pytest.mark.parametrize("model_type", REAL_TYPES)
def test_model_type_traces(model_type):
    cfg = ModelConfig(model_type=model_type, version=3)
    model = build_model(cfg)
    _, w, h = MODEL_TYPES[model_type]
    x = jax.ShapeDtypeStruct((1, 3, h, w), jnp.float32)
    shapes = jax.eval_shape(
        lambda xx: model.init(
            jax.random.PRNGKey(0), xx, deterministic=True, return_raw=True
        ),
        x,
    )
    n_params = sum(
        int(jnp.prod(jnp.asarray(l.shape)))
        for l in jax.tree_util.tree_leaves(shapes["params"])
    )
    assert n_params > 1e6, f"{model_type}: only {n_params} params"

    out_shapes = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, deterministic=True, return_raw=True),
        shapes,
        x,
    )
    inv_d, seg = out_shapes
    assert inv_d.shape[0] == 1 and len(inv_d.shape) == 3
    assert seg.shape[1] == 3


def test_midas_v21_builds_and_runs():
    """Legacy MiDaS v2.1 (BASELINE config 'depth_midas_v21')."""
    from soccdpt_tpu.models.midas import MidasNetV21

    model = MidasNetV21()
    x = jax.ShapeDtypeStruct((1, 3, 256, 256), jnp.float32)
    shapes = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx), x
    )
    out = jax.eval_shape(
        lambda v, xx: model.apply(v, xx), shapes, x
    )
    assert out.shape == (1, 256, 256)
    n_params = sum(
        int(jnp.prod(jnp.asarray(l.shape)))
        for l in jax.tree_util.tree_leaves(shapes["params"])
    )
    assert n_params > 80e6  # resnext101 ~88M + decoder


def test_resnext_test_backbone_shapes():
    from soccdpt_tpu.models.backbones.resnext import make_resnext_backbone

    factory, chans = make_resnext_backbone("resnexttest_64")
    bb = factory()
    import numpy as np

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(vars_, x, deterministic=True)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64),
        (1, 8, 8, 128),
        (1, 4, 4, 256),
        (1, 2, 2, 512),
    ]
