"""WHOLE-backbone parity vs HuggingFace ``transformers``.

test_torch_parity.py proves the *pieces* (attention, block, patch
merging) against torch oracles; these tests run the **entire backbone**
— patch embed -> all stages -> stage taps — at the real model configs
and real input sizes, against HF's independent implementations
(``Swinv2Model``, ``SwinModel``, ``BeitModel``, ``ViTModel``,
``LevitModel``; random weights copied across, no code shared with this
repo). This verifies the composition the reference assembles with timm
hooks: the hook-tap indices of ``/root/reference/SOccDPT/model/dpt.py:
51-89`` / ``backbones/swin_common.py:16-27``, patch-embed details,
downsample placement, window clamping at late stages, and
pretrained-window-size plumbing.

For the Swin families the comparison point is HF's
``output_hidden_states_before_downsampling`` states (== the tap at the
last block of each stage, which is what every real config hooks). For
ViT/BEiT/LeViT the taps are mid-trunk block outputs, captured on the
flax side via ``capture_intermediates``.

Bugs found by these tests (fixed in the same commit that added them):
swin2 zeroed pretrained_window_size under window clamping (timm keeps
it); LeViT downsample attention used num_heads[s+1] instead of timm's
embed_dim[s]//key_dim (12/16 for levit_384).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

# Whole-trunk composition parity is the slow lane: full 384-class
# models on one CPU core. Piece-level parity (test_torch_parity.py)
# stays in the fast lane.
pytestmark = pytest.mark.slow

from test_torch_parity import _copy_attn_weights, _t2n  # noqa: E402

# Accumulated float error over a full 12-24-block trunk is larger than
# the single-module tolerances; these bounds still catch any structural
# mismatch (wrong tap, wrong eps, wrong head count) by orders of
# magnitude.
RTOL, ATOL = 1e-4, 1e-4


def _rand_variables(model, x, seed, scale=0.05, **init_kw):
    """init then randomize every param leaf (zero-init biases/tables
    would mask indexing errors)."""
    variables = model.init(jax.random.PRNGKey(0), x, **init_kw)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    rngs = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [
        jax.random.normal(r, l.shape, jnp.float32).astype(l.dtype) * scale
        for r, l in zip(rngs, leaves)
    ]
    return {
        **jax.device_get(variables),
        "params": jax.device_get(
            jax.tree_util.tree_unflatten(treedef, leaves)
        ),
    }


def _copy_ln(hf_ln, p):
    with torch.no_grad():
        hf_ln.weight.copy_(torch.tensor(np.asarray(p["scale"])))
        hf_ln.bias.copy_(torch.tensor(np.asarray(p["bias"])))


def _copy_dense(hf_lin, p):
    with torch.no_grad():
        hf_lin.weight.copy_(torch.tensor(np.asarray(p["kernel"]).T))
        if getattr(hf_lin, "bias", None) is not None and "bias" in p:
            hf_lin.bias.copy_(torch.tensor(np.asarray(p["bias"])))


def _copy_conv(hf_conv, p):
    # flax HWIO -> torch OIHW
    with torch.no_grad():
        hf_conv.weight.copy_(
            torch.tensor(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))
        )
        if getattr(hf_conv, "bias", None) is not None and "bias" in p:
            hf_conv.bias.copy_(torch.tensor(np.asarray(p["bias"])))


def _img(B, S, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, S, S, 3), dtype=np.float32)


def _nchw_t(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


# ---------------------------------------------------------------------------
# Swin V2 (flagship family)
# ---------------------------------------------------------------------------


def _copy_swin2_block(hf_block, p):
    _copy_attn_weights(hf_block.attention.self, hf_block.attention.output, p["attn"])
    _copy_ln(hf_block.layernorm_before, p["norm1"])
    _copy_ln(hf_block.layernorm_after, p["norm2"])
    _copy_dense(hf_block.intermediate.dense, p["mlp_fc1"])
    _copy_dense(hf_block.output.dense, p["mlp_fc2"])


def _swin2_hf_from_flax(cfg, params, img_size):
    from transformers.models.swinv2.configuration_swinv2 import Swinv2Config
    from transformers.models.swinv2.modeling_swinv2 import Swinv2Model

    hf_cfg = Swinv2Config(
        image_size=img_size,
        patch_size=cfg.patch_size,
        embed_dim=cfg.embed_dim,
        depths=list(cfg.depths),
        num_heads=list(cfg.num_heads),
        window_size=cfg.window_size,
        pretrained_window_sizes=list(cfg.pretrained_window_sizes),
        mlp_ratio=cfg.mlp_ratio,
        drop_path_rate=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        hidden_act="gelu",
        layer_norm_eps=1e-5,
        use_absolute_embeddings=False,
    )
    hf = Swinv2Model(hf_cfg, add_pooling_layer=False)
    _copy_conv(hf.embeddings.patch_embeddings.projection, params["patch_embed"])
    _copy_ln(hf.embeddings.norm, params["patch_norm"])
    for i, stage in enumerate(hf.encoder.layers):
        for j, blk in enumerate(stage.blocks):
            _copy_swin2_block(blk, params[f"stage{i}_block{j}"])
        if stage.downsample is not None:
            pd = params[f"downsample{i}"]
            _copy_dense(stage.downsample.reduction, pd["reduction"])
            _copy_ln(stage.downsample.norm, pd["norm"])
    hf.eval()
    return hf


def _hf_swin_stage_feats(hf, pixel, grid):
    """(embedding -> encoder with before-downsampling states) -> list of
    4 NHWC stage features. Works for both SwinModel and Swinv2Model."""
    with torch.no_grad():
        emb, dims = hf.embeddings(pixel)
        out = hf.encoder(
            emb,
            dims,
            output_hidden_states=True,
            output_hidden_states_before_downsampling=True,
            return_dict=True,
        )
    feats = []
    for i, hs in enumerate(out.hidden_states[1:5]):
        g = (grid[0] >> i, grid[1] >> i)
        feats.append(_t2n(hs).reshape(hs.shape[0], g[0], g[1], hs.shape[-1]))
    return feats


@pytest.mark.parametrize(
    "name,size",
    [
        ("swin2t16_256", 256),  # flagship: window 16, stage grids 64/32/16/8
        # base_384 exercises pretrained_window_sizes=(12,12,12,6) AND the
        # stage-3 window clamp (grid 12 < window 24) where timm keeps the
        # pretrained size — the bug this test caught.
        ("swin2b24_384", 384),
    ],
)
def test_swin2_whole_backbone_vs_hf(name, size):
    from soccdpt_tpu.models.backbones.swin2 import (
        SWIN2_CONFIGS,
        make_swin2_backbone,
    )

    cfg = SWIN2_CONFIGS[name]
    factory, _ = make_swin2_backbone(name)
    model = factory()
    x = _img(1, size, 70)
    variables = _rand_variables(model, jnp.asarray(x[:1, :64, :64]), 71)
    feats = model.apply(variables, jnp.asarray(x), deterministic=True)

    hf = _swin2_hf_from_flax(cfg, variables["params"], size)
    grid = (size // cfg.patch_size, size // cfg.patch_size)
    hf_feats = _hf_swin_stage_feats(hf, _nchw_t(x), grid)

    # real configs tap the LAST block of every stage == HF's
    # before-downsampling states
    from soccdpt_tpu.models.backbones.swin2 import SWIN2_HOOKS

    assert SWIN2_HOOKS[name] == tuple(d - 1 for d in cfg.depths)
    for i, (got, want) in enumerate(zip(feats, hf_feats)):
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=RTOL, atol=ATOL,
            err_msg=f"{name} stage {i}",
        )


# ---------------------------------------------------------------------------
# Swin V1 (swinl12_384 = dpt_swin_large_384)
# ---------------------------------------------------------------------------


def _copy_swin1_block(hf_block, p):
    a = p["attn"]
    C = np.asarray(a["qkv"]["kernel"]).shape[0]
    k = np.asarray(a["qkv"]["kernel"])  # (C, 3C) [q|k|v]
    b = np.asarray(a["qkv"]["bias"])
    sa = hf_block.attention.self
    with torch.no_grad():
        sa.query.weight.copy_(torch.tensor(k[:, :C].T))
        sa.key.weight.copy_(torch.tensor(k[:, C : 2 * C].T))
        sa.value.weight.copy_(torch.tensor(k[:, 2 * C :].T))
        sa.query.bias.copy_(torch.tensor(b[:C]))
        sa.key.bias.copy_(torch.tensor(b[C : 2 * C]))
        sa.value.bias.copy_(torch.tensor(b[2 * C :]))
        sa.relative_position_bias_table.copy_(
            torch.tensor(np.asarray(a["rel_pos_table"]))
        )
    _copy_dense(hf_block.attention.output.dense, a["proj"])
    _copy_ln(hf_block.layernorm_before, p["norm1"])
    _copy_ln(hf_block.layernorm_after, p["norm2"])
    _copy_dense(hf_block.intermediate.dense, p["mlp_fc1"])
    _copy_dense(hf_block.output.dense, p["mlp_fc2"])


def test_swin1_large_whole_backbone_vs_hf():
    from transformers.models.swin.configuration_swin import SwinConfig
    from transformers.models.swin.modeling_swin import SwinModel

    from soccdpt_tpu.models.backbones.swin import (
        SWIN1_CONFIGS,
        SWIN1_HOOKS,
        make_swin1_backbone,
    )

    name, size = "swinl12_384", 384
    cfg = SWIN1_CONFIGS[name]
    factory, _ = make_swin1_backbone(name)
    model = factory()
    x = _img(1, size, 80)
    variables = _rand_variables(model, jnp.asarray(x[:1, :64, :64]), 81)
    feats = model.apply(variables, jnp.asarray(x), deterministic=True)

    hf_cfg = SwinConfig(
        image_size=size,
        patch_size=cfg.patch_size,
        embed_dim=cfg.embed_dim,
        depths=list(cfg.depths),
        num_heads=list(cfg.num_heads),
        window_size=cfg.window_size,
        mlp_ratio=cfg.mlp_ratio,
        drop_path_rate=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        hidden_act="gelu",
        layer_norm_eps=1e-5,
        use_absolute_embeddings=False,
    )
    hf = SwinModel(hf_cfg, add_pooling_layer=False)
    params = variables["params"]
    _copy_conv(hf.embeddings.patch_embeddings.projection, params["patch_embed"])
    _copy_ln(hf.embeddings.norm, params["patch_norm"])
    for i, stage in enumerate(hf.encoder.layers):
        for j, blk in enumerate(stage.blocks):
            _copy_swin1_block(blk, params[f"stage{i}_block{j}"])
        if stage.downsample is not None:
            pd = params[f"downsample{i}"]
            _copy_dense(stage.downsample.reduction, pd["reduction"])
            _copy_ln(stage.downsample.norm, pd["norm"])
    hf.eval()

    grid = (size // cfg.patch_size, size // cfg.patch_size)
    hf_feats = _hf_swin_stage_feats(hf, _nchw_t(x), grid)
    assert SWIN1_HOOKS[name] == tuple(d - 1 for d in cfg.depths)
    for i, (got, want) in enumerate(zip(feats, hf_feats)):
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=RTOL, atol=ATOL,
            err_msg=f"{name} stage {i}",
        )


# ---------------------------------------------------------------------------
# ViT / BEiT trunks (dpt_large / dpt_beit_base_384): block-tap outputs
# ---------------------------------------------------------------------------


def _capture_block_taps(model, variables, x, hooks):
    """Run the flax backbone capturing every block{i} output."""
    _, inter = model.apply(
        variables,
        x,
        deterministic=True,
        capture_intermediates=lambda mod, method: (
            method == "__call__" and (mod.name or "").startswith("block")
        ),
        mutable=["intermediates"],
    )
    taps = []
    for h in hooks:
        taps.append(np.asarray(inter["intermediates"][f"block{h}"]["__call__"][0]))
    return taps


def _copy_vit_block(hf_layer, p, family):
    a_q = hf_layer.attention.attention if hasattr(
        hf_layer.attention, "attention"
    ) else hf_layer.attention.self
    k = np.asarray(p["qkv"]["kernel"])
    C = k.shape[0]
    with torch.no_grad():
        a_q.query.weight.copy_(torch.tensor(k[:, :C].T))
        a_q.key.weight.copy_(torch.tensor(k[:, C : 2 * C].T))
        a_q.value.weight.copy_(torch.tensor(k[:, 2 * C :].T))
        if family == "beit":
            a_q.query.bias.copy_(torch.tensor(np.asarray(p["q_bias"])))
            a_q.value.bias.copy_(torch.tensor(np.asarray(p["v_bias"])))
            a_q.relative_position_bias.relative_position_bias_table.copy_(
                torch.tensor(np.asarray(p["rel_pos_table"]))
            )
            hf_layer.lambda_1.copy_(torch.tensor(np.asarray(p["gamma_1"])))
            hf_layer.lambda_2.copy_(torch.tensor(np.asarray(p["gamma_2"])))
        else:
            b = np.asarray(p["qkv"]["bias"])
            a_q.query.bias.copy_(torch.tensor(b[:C]))
            a_q.key.bias.copy_(torch.tensor(b[C : 2 * C]))
            a_q.value.bias.copy_(torch.tensor(b[2 * C :]))
    _copy_dense(hf_layer.attention.output.dense, p["proj"])
    _copy_ln(hf_layer.layernorm_before, p["norm1"])
    _copy_ln(hf_layer.layernorm_after, p["norm2"])
    _copy_dense(hf_layer.intermediate.dense, p["mlp_fc1"])
    _copy_dense(hf_layer.output.dense, p["mlp_fc2"])


def test_beit_base_whole_trunk_vs_hf():
    from transformers.models.beit.configuration_beit import BeitConfig
    from transformers.models.beit.modeling_beit import BeitModel

    from soccdpt_tpu.models.backbones.vit import (
        VIT_CONFIGS,
        VIT_HOOKS,
        make_vit_backbone,
    )

    name, size = "beitb16_384", 384
    cfg = VIT_CONFIGS[name]
    factory, _ = make_vit_backbone(name, use_pallas=False)
    model = factory()
    x = _img(1, size, 90)
    # BEiT rel-pos table shapes depend on the input grid: init at size.
    variables = _rand_variables(model, jnp.asarray(x), 91)
    taps = _capture_block_taps(
        model, variables, jnp.asarray(x), VIT_HOOKS[name]
    )

    hf_cfg = BeitConfig(
        image_size=size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.embed_dim,
        num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads,
        intermediate_size=int(cfg.embed_dim * cfg.mlp_ratio),
        use_relative_position_bias=True,
        use_shared_relative_position_bias=False,
        use_absolute_position_embeddings=False,
        use_mask_token=False,
        layer_scale_init_value=cfg.layer_scale_init,
        hidden_act="gelu",
        layer_norm_eps=1e-6,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    hf = BeitModel(hf_cfg, add_pooling_layer=False)
    params = variables["params"]
    with torch.no_grad():
        hf.embeddings.cls_token.copy_(
            torch.tensor(np.asarray(params["cls_token"]))
        )
    _copy_conv(hf.embeddings.patch_embeddings.projection, params["patch_embed"])
    for i, layer in enumerate(hf.encoder.layer):
        _copy_vit_block(layer, params[f"block{i}"], "beit")
    hf.eval()
    with torch.no_grad():
        out = hf(_nchw_t(x), output_hidden_states=True)
    for tap, h in zip(taps, VIT_HOOKS[name]):
        np.testing.assert_allclose(
            tap, _t2n(out.hidden_states[h + 1]), rtol=RTOL, atol=ATOL,
            err_msg=f"beit block {h}",
        )


def test_vit_large_whole_trunk_vs_hf():
    from transformers.models.vit.configuration_vit import ViTConfig as HFViTConfig
    from transformers.models.vit.modeling_vit import ViTModel

    from soccdpt_tpu.models.backbones.vit import (
        VIT_CONFIGS,
        VIT_HOOKS,
        make_vit_backbone,
    )

    name, size = "vitl16_384", 384
    cfg = VIT_CONFIGS[name]
    factory, _ = make_vit_backbone(name, use_pallas=False)
    model = factory()
    x = _img(1, size, 95)
    # native size -> no pos-embed resize on either side
    variables = _rand_variables(model, jnp.asarray(x), 96)
    taps = _capture_block_taps(
        model, variables, jnp.asarray(x), VIT_HOOKS[name]
    )

    hf_cfg = HFViTConfig(
        image_size=size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.embed_dim,
        num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads,
        intermediate_size=int(cfg.embed_dim * cfg.mlp_ratio),
        hidden_act="gelu",
        layer_norm_eps=1e-6,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        qkv_bias=True,
    )
    hf = ViTModel(hf_cfg, add_pooling_layer=False)
    params = variables["params"]
    with torch.no_grad():
        hf.embeddings.cls_token.copy_(
            torch.tensor(np.asarray(params["cls_token"]))
        )
        hf.embeddings.position_embeddings.copy_(
            torch.tensor(np.asarray(params["pos_embed"]))
        )
    _copy_conv(hf.embeddings.patch_embeddings.projection, params["patch_embed"])
    for i, layer in enumerate(hf.encoder.layer):
        _copy_vit_block(layer, params[f"block{i}"], "vit")
    hf.eval()
    with torch.no_grad():
        out = hf(_nchw_t(x), output_hidden_states=True)
    for tap, h in zip(taps, VIT_HOOKS[name]):
        np.testing.assert_allclose(
            tap, _t2n(out.hidden_states[h + 1]), rtol=RTOL, atol=ATOL,
            err_msg=f"vit block {h}",
        )


# ---------------------------------------------------------------------------
# LeViT (levit_384 = dpt_levit_224): HF -> flax, manual layer walk
# ---------------------------------------------------------------------------


def test_levit_whole_backbone_vs_hf():
    from transformers.models.levit.configuration_levit import LevitConfig
    from transformers.models.levit.modeling_levit import LevitModel

    from test_torch_parity import _randomize_levit_module, _set_bndense

    from soccdpt_tpu.models.backbones.levit import (
        LEVIT_CONFIGS,
        LEVIT_HOOKS,
        make_levit_backbone,
    )

    name, size = "levit_384", 224
    cfg = LEVIT_CONFIGS[name]
    hooks = LEVIT_HOOKS[name]

    hf_cfg = LevitConfig(
        image_size=size,
        hidden_sizes=list(cfg.embed_dims),
        num_attention_heads=list(cfg.num_heads),
        depths=list(cfg.depths),
        key_dim=[cfg.key_dim] * 3,
        attention_ratio=[int(cfg.attn_ratio)] * 3,
        mlp_ratio=[int(cfg.mlp_ratio)] * 3,
        down_ops=[
            ["Subsample", cfg.key_dim, cfg.embed_dims[0] // cfg.key_dim,
             int(2 * cfg.attn_ratio), int(cfg.mlp_ratio), 2],
            ["Subsample", cfg.key_dim, cfg.embed_dims[1] // cfg.key_dim,
             int(2 * cfg.attn_ratio), int(cfg.mlp_ratio), 2],
        ],
        drop_path_rate=0,
    )
    hf = LevitModel(hf_cfg)
    _randomize_levit_module(hf, 101)
    hf.eval()

    # flattened layer walk mirroring timm's model.blocks indices
    x = _img(1, size, 102)
    with torch.no_grad():
        tok = hf.patch_embeddings(_nchw_t(x))
        if tok.dim() == 4:
            tok = tok.flatten(2).transpose(1, 2)
        hf_seq = []
        for stage in hf.encoder.stages:
            for layer in stage.layers:
                tok = layer(tok)
                hf_seq.append(_t2n(tok))

    factory, _ = make_levit_backbone(name)
    model = factory()
    variables = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.asarray(x), deterministic=True)
    )
    p, s = variables["params"], variables["batch_stats"]

    # stem: HF embedding_layer_1..4 = my stem0..3
    for i in range(4):
        emb = getattr(hf.patch_embeddings, f"embedding_layer_{i + 1}")
        p[f"stem{i}"]["conv"]["kernel"] = np.transpose(
            _t2n(emb.convolution.weight), (2, 3, 1, 0)
        )
        p[f"stem{i}"]["bn"]["scale"] = _t2n(emb.batch_norm.weight)
        p[f"stem{i}"]["bn"]["bias"] = _t2n(emb.batch_norm.bias)
        s[f"stem{i}"]["bn"]["mean"] = _t2n(emb.batch_norm.running_mean)
        s[f"stem{i}"]["bn"]["var"] = _t2n(emb.batch_norm.running_var)

    def copy_attn(name, hf_attn, subsample):
        if subsample:
            _set_bndense(p[name]["kv"], s[name]["kv"], hf_attn.keys_values)
            _set_bndense(p[name]["q"], s[name]["q"], hf_attn.queries)
        else:
            _set_bndense(
                p[name]["qkv"], s[name]["qkv"], hf_attn.queries_keys_values
            )
        _set_bndense(p[name]["proj"], s[name]["proj"], hf_attn.projection)
        p[name]["attn_bias"] = _t2n(hf_attn.attention_biases)

    def copy_mlp(name, hf_mlp):
        _set_bndense(p[name]["fc1"], s[name]["fc1"], hf_mlp.linear_up)
        _set_bndense(p[name]["fc2"], s[name]["fc2"], hf_mlp.linear_down)

    for st, stage in enumerate(hf.encoder.stages):
        res_pairs = [
            l for l in stage.layers if type(l).__name__ == "LevitResidualLayer"
        ]
        subs = [
            l for l in stage.layers
            if type(l).__name__ == "LevitAttentionSubsample"
        ]
        d = 0
        it = iter(stage.layers)
        for layer in it:
            tname = type(layer).__name__
            if tname == "LevitAttentionSubsample":
                copy_attn(f"downsample{st}_attn", layer, subsample=True)
                nxt = next(it)  # the subsample's residual MLP
                copy_mlp(f"downsample{st}_mlp", nxt.module)
            else:
                mod = layer.module
                if type(mod).__name__ == "LevitAttention":
                    copy_attn(f"s{st}_attn{d}", mod, subsample=False)
                else:
                    copy_mlp(f"s{st}_mlp{d}", mod)
                    d += 1
        assert len(subs) in (0, 1) and len(res_pairs) >= 2

    feats = model.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x), deterministic=True
    )
    # reconstruct expected grids: 14 -> 7 -> 4 for 224 px
    g = size // 16
    grids = [(g, g), (-(-g // 2), -(-g // 2)), (-(-(-(-g // 2)) // 2),) * 2]
    grids[2] = (-(-grids[1][0] // 2), -(-grids[1][1] // 2))
    for lvl, (h, got) in enumerate(zip(hooks, feats)):
        gh, gw = grids[lvl]
        want = hf_seq[h].reshape(1, gh, gw, -1)
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=RTOL, atol=ATOL,
            err_msg=f"levit block {h} (stage {lvl})",
        )


# ---------------------------------------------------------------------------
# ViT-hybrid (vitb_rn50_384 = dpt_hybrid_384): BiT R50 trunk + ViT-B blocks
# ---------------------------------------------------------------------------


def test_vit_hybrid_whole_backbone_vs_hf():
    """Whole hybrid trunk vs HF ``ViTHybridModel`` (independent impl of
    the same timm ``vit_base_r50_s16_384`` the reference wraps): the two
    ResNet stage taps (256 @ /4, 512 @ /8 — reference hooks [0, 1] at
    vit.py:163-171) against ``BitBackbone`` feature maps, and the ViT
    block-8/11 token taps against ``output_hidden_states``.

    This test caught the round-3 structure bug: the flax trunk used
    PRE-activation bottlenecks with symmetric padding where timm/HF use
    non-preact v1.5 bottlenecks with TF-SAME padding and a normed stem.
    """
    from transformers.models.bit.configuration_bit import BitConfig
    from transformers.models.deprecated.vit_hybrid.configuration_vit_hybrid import (
        ViTHybridConfig,
    )
    from transformers.models.deprecated.vit_hybrid.modeling_vit_hybrid import (
        ViTHybridModel,
    )

    from soccdpt_tpu.models.backbones.vit_hybrid import (
        HYBRID_CONFIGS,
        make_vit_hybrid_backbone,
    )

    name, size = "vitb_rn50_384", 384
    cfg = HYBRID_CONFIGS[name]
    factory, _ = make_vit_hybrid_backbone(name)
    model = factory()
    x = _img(1, size, 110)
    variables = _rand_variables(model, jnp.asarray(x[:1, :64, :64]), 111)
    feats, inter = model.apply(
        variables,
        jnp.asarray(x),
        deterministic=True,
        capture_intermediates=lambda mod, method: (
            method == "__call__" and (mod.name or "").startswith("block")
        ),
        mutable=["intermediates"],
    )
    vit_taps = [
        np.asarray(inter["intermediates"][f"block{h}"]["__call__"][0])
        for h in cfg.vit_hooks
    ]

    bit_cfg = BitConfig(
        embedding_size=cfg.stem_width,
        hidden_sizes=[cfg.stem_width * 4, cfg.stem_width * 8, cfg.stem_width * 16],
        depths=list(cfg.stage_blocks),
        layer_type="bottleneck",
        hidden_act="relu",
        global_padding="SAME",
        num_groups=32,
        embedding_dynamic_padding=True,
        out_features=["stage1", "stage2", "stage3"],
    )
    hf_cfg = ViTHybridConfig(
        backbone_config=bit_cfg,
        image_size=size,
        patch_size=1,
        hidden_size=cfg.vit.embed_dim,
        num_hidden_layers=cfg.vit.depth,
        num_attention_heads=cfg.vit.num_heads,
        intermediate_size=int(cfg.vit.embed_dim * cfg.vit.mlp_ratio),
        backbone_featmap_shape=[1, cfg.stem_width * 16, size // 16, size // 16],
        hidden_act="gelu",
        layer_norm_eps=1e-6,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        qkv_bias=True,
    )
    # use_mask_token=True: HF's deprecated _init_weights dereferences
    # mask_token unconditionally; the token is unused without
    # bool_masked_pos.
    hf = ViTHybridModel(hf_cfg, add_pooling_layer=False, use_mask_token=True)

    params = variables["params"]
    bit = hf.embeddings.patch_embeddings.backbone.bit
    _copy_conv(bit.embedder.convolution, params["stem_conv"])
    _copy_ln(bit.embedder.norm, params["stem_gn"])
    for s_i, stage in enumerate(bit.encoder.stages):
        for b_i, layer in enumerate(stage.layers):
            p = params[f"stage{s_i}_block{b_i}"]
            for c in ("conv1", "conv2", "conv3"):
                _copy_conv(getattr(layer, c), p[c])
            for n, g in (("norm1", "gn1"), ("norm2", "gn2"), ("norm3", "gn3")):
                _copy_ln(getattr(layer, n), p[g])
            if layer.downsample is not None:
                _copy_conv(layer.downsample.conv, p["downsample_conv"])
                _copy_ln(layer.downsample.norm, p["downsample_gn"])
    with torch.no_grad():
        hf.embeddings.cls_token.copy_(
            torch.tensor(np.asarray(params["cls_token"]))
        )
        hf.embeddings.position_embeddings.copy_(
            torch.tensor(np.asarray(params["pos_embed"]))
        )
    _copy_conv(hf.embeddings.patch_embeddings.projection, params["patch_embed_proj"])
    for i, layer in enumerate(hf.encoder.layer):
        _copy_vit_block(layer, params[f"block{i}"], "vit")
    hf.eval()

    pixel = _nchw_t(x)
    with torch.no_grad():
        bb_out = hf.embeddings.patch_embeddings.backbone(pixel)
        out = hf(pixel, output_hidden_states=True)

    # ResNet stage taps (NCHW -> NHWC)
    for lvl in range(2):
        want = np.transpose(_t2n(bb_out.feature_maps[lvl]), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(feats[lvl]), want, rtol=RTOL, atol=ATOL,
            err_msg=f"hybrid resnet stage {lvl}",
        )
    # ViT block taps (tokens incl. cls)
    for tap, h in zip(vit_taps, cfg.vit_hooks):
        np.testing.assert_allclose(
            tap, _t2n(out.hidden_states[h + 1]), rtol=RTOL, atol=ATOL,
            err_msg=f"hybrid vit block {h}",
        )


# ---------------------------------------------------------------------------
# Next-ViT (next_vit_large_6m = dpt_next_vit_large_384): from-spec torch
# oracle (no timm/bytedance code installable in this environment)
# ---------------------------------------------------------------------------


def test_next_vit_whole_backbone_vs_torch_oracle():
    """Whole Next-ViT-Large trunk vs an independent torch re-derivation
    of the official bytedance module (tests/nextvit_torch_oracle.py):
    all four timm ``features[i]`` hook taps (reference
    backbones/next_vit.py:18-29, hooks [2, 6, 36, 39]) with randomized
    params AND non-trivial BatchNorm running statistics, eval mode.
    Input 224 (the trunk has no resolution-dependent parameters; 224
    keeps the 40-block forward tractable on one CPU core)."""
    from nextvit_torch_oracle import NextViTTorch

    from soccdpt_tpu.models.backbones.next_vit import (
        NEXT_VIT_CONFIGS,
        NEXT_VIT_HOOKS,
        make_next_vit_backbone,
    )

    name, size = "next_vit_large_6m", 224
    cfg = NEXT_VIT_CONFIGS[name]
    hooks = NEXT_VIT_HOOKS[name]
    factory, _ = make_next_vit_backbone(name)
    model = factory()
    x = _img(1, size, 120)

    variables = _rand_variables(
        model, jnp.asarray(x), 121, deterministic=True
    )
    # Non-trivial BN running stats: zero-mean/unit-var defaults would
    # mask swapped or dropped running-stat imports.
    rng = np.random.default_rng(122)
    stats = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            rng.normal(0.0, 0.05, leaf.shape).astype(np.float32)
            if path[-1].key == "mean"
            else rng.uniform(0.8, 1.2, leaf.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    variables = {**variables, "batch_stats": stats}
    feats = model.apply(variables, jnp.asarray(x), deterministic=True)

    hf = NextViTTorch(
        stem_chs=cfg.stem_chs,
        depths=cfg.depths,
        strides=cfg.strides,
        sr_ratios=cfg.sr_ratios,
        head_dim=cfg.head_dim,
        mix_block_ratio=cfg.mix_block_ratio,
        divisor=cfg.divisor,
    )

    params = variables["params"]

    def copy_bn(tbn, p, s):
        with torch.no_grad():
            tbn.weight.copy_(torch.tensor(np.asarray(p["scale"])))
            tbn.bias.copy_(torch.tensor(np.asarray(p["bias"])))
            tbn.running_mean.copy_(torch.tensor(np.asarray(s["mean"])))
            tbn.running_var.copy_(torch.tensor(np.asarray(s["var"])))

    def copy_patch_embed(tpe, p, s):
        if "conv" in p:
            _copy_conv(tpe.conv, p["conv"])
            copy_bn(tpe.norm, p["norm"], s["norm"])

    def copy_mhca(tm, p, s):
        _copy_conv(tm.group_conv3x3, p["group_conv3x3"])
        copy_bn(tm.norm, p["norm"], s["norm"])
        _copy_conv(tm.projection, p["projection"])

    def copy_mlp(tm, p):
        _copy_conv(tm.conv1, p["conv1"])
        _copy_conv(tm.conv2, p["conv2"])

    for i in range(4):
        p, s = params[f"stem{i}"], stats[f"stem{i}"]
        _copy_conv(hf.stem[i].conv, p["conv"])
        copy_bn(hf.stem[i].norm, p["norm"], s["norm"])

    for blk, (btype, *_rest) in enumerate(cfg.plan()):
        t = hf.features[blk]
        p = params[f"features{blk}"]
        s = stats.get(f"features{blk}", {})
        if btype == "ncb":
            copy_patch_embed(t.patch_embed, p.get("patch_embed", {}),
                             s.get("patch_embed", {}))
            copy_mhca(t.mhca, p["mhca"], s["mhca"])
            copy_bn(t.norm, p["norm"], s["norm"])
            copy_mlp(t.mlp, p["mlp"])
        else:
            copy_patch_embed(t.patch_embed, p.get("patch_embed", {}),
                             s.get("patch_embed", {}))
            copy_bn(t.norm1, p["norm1"], s["norm1"])
            for d in ("q", "k", "v", "proj"):
                _copy_dense(getattr(t.e_mhsa, d), p["e_mhsa"][d])
            if "norm" in p["e_mhsa"]:
                copy_bn(t.e_mhsa.norm, p["e_mhsa"]["norm"],
                        s["e_mhsa"]["norm"])
            copy_patch_embed(t.projection, p["projection"], s["projection"])
            copy_mhca(t.mhca, p["mhca"], s["mhca"])
            copy_bn(t.norm2, p["norm2"], s["norm2"])
            copy_mlp(t.mlp, p["mlp"])
    hf.eval()

    with torch.no_grad():
        torch_taps = hf(_nchw_t(x), set(hooks))

    for lvl, (got, want) in enumerate(zip(feats, torch_taps)):
        np.testing.assert_allclose(
            np.asarray(got),
            np.transpose(_t2n(want), (0, 2, 3, 1)),
            rtol=RTOL, atol=ATOL,
            err_msg=f"next_vit tap {hooks[lvl]} (level {lvl})",
        )
