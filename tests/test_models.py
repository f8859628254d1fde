"""Golden-shape and behavior tests for backbones, DPT trunk, SOccDPT.

Uses the tiny ``dpt_swin2_test_64`` config so full-graph tests stay fast
on a single CPU core; the real-size graph is exercised on TPU by
bench.py and __graft_entry__.py.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccdpt_tpu.core.config import CameraConfig, ModelConfig, OccupancyConfig
from soccdpt_tpu.models.backbones import make_backbone
from soccdpt_tpu.models.soccdpt import build_model

TEST_CAMERA = CameraConfig(fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48)


def tiny_cfg(version=3, **kw):
    return ModelConfig(
        model_type="dpt_swin2_test_64",
        version=version,
        features=64,
        camera=TEST_CAMERA,
        **kw,
    )


def test_swin2_backbone_stage_shapes():
    factory, chans = make_backbone("swin2test_64")
    bb = factory()
    assert chans == (16, 32, 64, 128)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(vars_, x)
    # Strides 4/8/16/32 of the input (reference swin_common.py:38-52).
    assert [f.shape for f in feats] == [
        (2, 16, 16, 16),
        (2, 8, 8, 32),
        (2, 4, 4, 64),
        (2, 2, 2, 128),
    ]


@pytest.mark.parametrize("version", [1, 2, 3])
def test_soccdpt_versions_raw_outputs(version):
    cfg = tiny_cfg(version=version)
    model = build_model(cfg)
    x = jnp.zeros((2, 3, 64, 64))
    vars_ = model.init(jax.random.PRNGKey(0), x, return_raw=True)
    inv_depth, seg = model.apply(vars_, x, return_raw=True)
    assert inv_depth.shape == (2, 64, 64)
    assert seg.shape == (2, 3, 64, 64)
    # non_negative head -> ReLU output; sigmoid seg in [0, 1]
    assert float(jnp.min(inv_depth)) >= 0.0
    assert float(jnp.min(seg)) >= 0.0 and float(jnp.max(seg)) <= 1.0


def test_soccdpt_v3_full_geometry():
    cfg = tiny_cfg(version=3)
    model = build_model(cfg)
    x = jnp.ones((1, 3, 64, 64)) * 0.25
    vars_ = model.init(jax.random.PRNGKey(0), x, return_raw=True)
    inv_d, seg, points, grid = model.apply(
        vars_, x, compute_occ=True
    )
    H, W = TEST_CAMERA.height, TEST_CAMERA.width
    assert inv_d.shape == (1, H, W)
    assert seg.shape == (1, 3, H, W)
    assert points.shape == (1, H, W, 3)
    gx, gy, gz = cfg.occupancy.grid_size
    assert grid.shape == (1, gx, gy, gz, 3)
    assert bool(jnp.all(jnp.isfinite(points)))


def test_soccdpt_v3_no_occ_returns_none():
    cfg = tiny_cfg(version=3)
    model = build_model(cfg)
    x = jnp.zeros((1, 3, 64, 64))
    vars_ = model.init(jax.random.PRNGKey(0), x, return_raw=True)
    out = model.apply(vars_, x, compute_occ=False)
    assert out[3] is None


def test_v1_has_two_backbones_v3_has_one():
    x = jnp.zeros((1, 3, 64, 64))
    p1 = build_model(tiny_cfg(version=1)).init(
        jax.random.PRNGKey(0), x, return_raw=True
    )["params"]
    p3 = build_model(tiny_cfg(version=3)).init(
        jax.random.PRNGKey(0), x, return_raw=True
    )["params"]
    assert "depth_net" in p1 and "seg_net" in p1
    assert "depth_net" in p3 and "seg_head" in p3 and "seg_net" not in p3


def test_train_mode_mutates_batch_stats():
    cfg = tiny_cfg(version=3)
    model = build_model(cfg)
    x = jnp.ones((2, 3, 64, 64))
    vars_ = model.init(jax.random.PRNGKey(0), x, return_raw=True)
    assert "batch_stats" in vars_  # seg head BN
    out, updates = model.apply(
        vars_,
        x,
        deterministic=False,
        return_raw=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    leaves_before = jax.tree_util.tree_leaves(vars_["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after)
    )


def test_serving_pipeline_end_to_end():
    """uint8 frames -> (inv_depth, seg, points, occ) in one jit."""
    from soccdpt_tpu.serving import make_serving_fn

    cfg = dataclasses.replace(
        tiny_cfg(version=3),
        occupancy=dataclasses.replace(
            tiny_cfg().occupancy,
            grid_size=(16, 16, 8),
            pc_scale=(1.0, 1.0, 1.0),
            pc_shift=(2.0, 2.0, 0.0),
            correction_angle=(0.0, 0.0, 0.0),
        ),
    )
    model = build_model(cfg)
    frames = np.random.default_rng(0).integers(
        0, 255, (1, 48, 64, 3), dtype=np.uint8
    )
    # init with the preprocessed shape the serving fn will produce
    x0 = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), x0, return_raw=True)
    serve = make_serving_fn(cfg, variables, compute_occ=True)
    inv_d, seg, points, occ = serve(jnp.asarray(frames))
    assert inv_d.shape == (1, 48, 64)
    assert seg.shape == (1, 3, 48, 64)
    assert points.shape == (1, 48, 64, 3)
    assert occ.shape == (1, 16, 16, 8, 3)


def test_serve_stream_matches_sequential():
    """Pipelined serving yields the same outputs, in order, as calling
    the serving fn frame by frame."""
    from soccdpt_tpu.serving import make_serving_fn, serve_stream

    cfg = tiny_cfg(version=3)
    model = build_model(cfg)
    x0 = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), x0, return_raw=True)
    serve = make_serving_fn(cfg, variables)

    rng = np.random.default_rng(1)
    frames = [
        rng.integers(0, 255, (1, 48, 64, 3), dtype=np.uint8) for _ in range(5)
    ]
    streamed = list(serve_stream(serve, iter(frames), depth=2))
    assert len(streamed) == 5
    for frame, got in zip(frames, streamed):
        want = serve(jnp.asarray(frame))
        for w, g in zip(
            jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)
        ):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


@pytest.mark.parametrize(
    "backbone",
    ["swin2test_64", "swin1test_64", "beittest_64", "levittest_64"],
)
def test_bias_cache_matches_inline(backbone):
    """Folding param-derived attention biases at bind time
    (models/bias_cache.py) must leave the forward numerically identical
    up to compiler-scheduling ulps (the cached and inline paths are
    separate compiled graphs, so bit-exactness is not guaranteed), for
    every backbone family that gathers a bias table."""
    from soccdpt_tpu.models.backbones import make_backbone
    from soccdpt_tpu.models.bias_cache import build_inference_cache

    bb_factory, _ = make_backbone(backbone)
    model = bb_factory()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3, 64, 64)), jnp.float32
    ).transpose(0, 2, 3, 1)
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    # randomize params so zero-init biases don't mask indexing errors
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    rngs = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [
        jax.random.normal(r, l.shape, l.dtype) * 0.05
        for r, l in zip(rngs, leaves)
    ]
    variables = {
        **variables, "params": jax.tree_util.tree_unflatten(treedef, leaves)
    }

    # init must NOT hand out a cache — that would bind biases to the
    # init-time params and go stale when weights are replaced (torch
    # import / checkpoint restore)
    assert "cache" not in variables, "model.init must not create a cache"

    want = model.apply(variables, x, deterministic=True)  # inline path
    cached_vars = build_inference_cache(
        model, variables, x, deterministic=True
    )
    assert cached_vars["cache"], "cache collection should be non-empty"
    got = model.apply(cached_vars, x, deterministic=True)
    for w, g in zip(
        jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)
    ):
        # the cache is built under jit, the inline path here is eager —
        # identical math, last-ulp scheduling differences allowed
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), atol=1e-6, rtol=1e-6
        )

    # and under jit with the cache as an argument
    jit_got = jax.jit(
        lambda v, inp: model.apply(v, inp, deterministic=True)
    )(cached_vars, x)
    for w, g in zip(
        jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(jit_got)
    ):
        np.testing.assert_allclose(
            np.asarray(w, np.float32), np.asarray(g, np.float32), atol=1e-5
        )

    # staleness guard: refolding after a weight change must track the
    # NEW params, not return the old cache
    leaves2 = [l * 2.0 for l in jax.tree_util.tree_leaves(cached_vars["params"])]
    newer = {
        **cached_vars,
        "params": jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(cached_vars["params"]), leaves2
        ),
    }
    refolded = build_inference_cache(model, newer, x, deterministic=True)
    want2 = model.apply(
        {k: v for k, v in newer.items() if k != "cache"}, x, deterministic=True
    )
    got2 = model.apply(refolded, x, deterministic=True)
    for w, g in zip(
        jax.tree_util.tree_leaves(want2), jax.tree_util.tree_leaves(got2)
    ):
        # refolding must track the NEW params...
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), atol=1e-5, rtol=1e-5
        )
    # ...i.e. the rebuilt cache arrays actually changed — a stale-cache
    # short-circuit (the bug this machinery once had) would return the
    # old arrays untouched
    old_leaves = jax.tree_util.tree_leaves(cached_vars["cache"])
    new_leaves = jax.tree_util.tree_leaves(refolded["cache"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(old_leaves, new_leaves)
    ), "refold returned the stale cache"


def test_bias_cache_dtype_option():
    """bf16 bias cache: outputs stay close to the f32-cached forward
    (serving knob; ~0.4% logit perturbation bound)."""
    from soccdpt_tpu.models.backbones import make_backbone
    from soccdpt_tpu.models.bias_cache import build_inference_cache

    bb_factory, _ = make_backbone("beittest_64")
    model = bb_factory()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    rngs = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    variables = {
        **variables,
        "params": jax.tree_util.tree_unflatten(
            treedef,
            [jax.random.normal(r, l.shape, l.dtype) * 0.05
             for r, l in zip(rngs, leaves)],
        ),
    }
    full = build_inference_cache(model, variables, x, deterministic=True)
    half = build_inference_cache(
        model, variables, x, cache_dtype=jnp.bfloat16, deterministic=True
    )
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree_util.tree_leaves(half["cache"])
    )
    want = model.apply(full, x, deterministic=True)
    got = model.apply(half, x, deterministic=True)
    for w, g in zip(
        jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)
    ):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), atol=5e-2, rtol=5e-2
        )


def test_serving_batch_sharded_matches_unsharded():
    """Data-parallel serving: a batch sharded over the 8-device mesh
    yields the same outputs as unsharded serving (pjit inserts the
    collectives; serving needs no code changes)."""
    import jax.sharding as shd

    from soccdpt_tpu.parallel import mesh as mesh_lib
    from soccdpt_tpu.serving import make_serving_fn

    cfg = tiny_cfg(version=3)
    model = build_model(cfg)
    x0 = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), x0, return_raw=True)
    serve = make_serving_fn(cfg, variables)

    frames = np.random.default_rng(2).integers(
        0, 255, (8, 48, 64, 3), dtype=np.uint8
    )
    want = serve(jnp.asarray(frames))

    mesh = mesh_lib.make_mesh()
    sharded = jax.device_put(
        frames, shd.NamedSharding(mesh, shd.PartitionSpec("data"))
    )
    got = serve(sharded)
    # compare the bounded outputs (disp, seg); the unprojected points
    # amplify last-ulp bf16 differences through 1/disp near zero
    for w, g in zip(want[:2], got[:2]):
        np.testing.assert_allclose(
            np.asarray(w, np.float32), np.asarray(g, np.float32),
            atol=1e-5, rtol=1e-5,
        )
    assert bool(jnp.all(jnp.isfinite(got[2])))


def test_occupancy_head_folded_matches_conv3d():
    """The depth-folded MXU path of OccupancyHead equals a plain 3-D
    nn.Conv chain run on the SAME parameters (the param tree is the
    (3,3,3) kernels either way). Oracle is written inline here so the
    product path has no 3-D convs left to share bugs with."""
    from flax import linen as nn

    from soccdpt_tpu.models.heads import OccupancyHead
    from soccdpt_tpu.ops.resize import resize_hw

    class Oracle3D(nn.Module):
        num_classes: int = 3

        @nn.compact
        def __call__(self, g):
            x = nn.Conv(8, (3, 3, 3), padding=1, name="conv1")(g)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            x = nn.Conv(16, (3, 3, 3), padding=1, name="conv2")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            x = nn.Conv(32, (3, 3, 3), padding=1, name="conv3")(x)
            x = nn.relu(x)
            x = nn.Conv(self.num_classes, (3, 3, 3), padding=1, name="conv4")(x)
            x = x.astype(jnp.float32)
            B, X, Y, Z, C = x.shape
            gx, gy, gz = g.shape[1:4]
            x = resize_hw(
                x.reshape(B, X, Y, Z * C), (gx, gy), "bilinear"
            ).reshape(B, gx, gy, Z, C)
            x = resize_hw(
                x.transpose(0, 3, 1, 2, 4).reshape(B, Z, gx, gy * C),
                (gz, gx),
                "bilinear",
            ).reshape(B, gz, gx, gy, C).transpose(0, 2, 3, 1, 4)
            return nn.sigmoid(x)

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((2, 16, 16, 8, 3)), jnp.float32)
    head = OccupancyHead(num_classes=3, identity=False, dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), g)
    want = Oracle3D(num_classes=3).apply(variables, g)
    got = head.apply(variables, g)
    assert got.shape == g.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5
    )

    # and the folded path is differentiable w.r.t. the kernels
    def loss(v):
        return jnp.sum(head.apply(v, g) ** 2)

    grads = jax.grad(loss)(variables)
    leaf = grads["params"]["conv1"]["kernel"]
    assert leaf.shape == (3, 3, 3, 3, 8)
    assert bool(jnp.any(leaf != 0))

    # 4-D depth-folded channel-minor input (the voxelizer's native
    # layout, channel index c*gz + z) produces the identical output
    b, gx, gy, gz, c = g.shape
    g_folded = g.transpose(0, 1, 2, 4, 3).reshape(b, gx, gy, c * gz)
    got_folded = head.apply(variables, g_folded)
    assert got_folded.shape == g.shape
    np.testing.assert_allclose(
        np.asarray(got_folded), np.asarray(got), atol=2e-6, rtol=1e-5
    )


def test_depth_head_fused_upconv_matches_naive():
    """The shifted-resize matmul form of conv2(upsample2x(x)) must equal
    the naive order under identical params — values AND gradients
    (_UpConv docstring; serving profile round 5). Odd sizes included."""
    from soccdpt_tpu.models.heads import _UpConv

    rng = np.random.default_rng(11)
    for h, w, cin, cout in [(16, 16, 8, 32), (9, 13, 16, 8)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        fused = _UpConv(cout, fused=True)
        naive = _UpConv(cout, fused=False)
        variables = naive.init(jax.random.PRNGKey(0), x)
        want = naive.apply(variables, x)
        got = fused.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5,
            err_msg=f"{h}x{w}",
        )
        wgt = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)
        g_naive = jax.grad(
            lambda p: (naive.apply({"params": p}, x) * wgt).sum()
        )(variables["params"])
        g_fused = jax.grad(
            lambda p: (fused.apply({"params": p}, x) * wgt).sum()
        )(variables["params"])
        for a, b in zip(
            jax.tree_util.tree_leaves(g_naive),
            jax.tree_util.tree_leaves(g_fused),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4
            )
