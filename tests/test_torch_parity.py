"""Numerical parity against torch ground truth.

Unlike test_torch_import.py (round-trips of the key *mapping*), the
oracles here are real torch implementations executing the reference's
math:

* the reference's own timm-free decoder modules
  (``/root/reference/SOccDPT/model/blocks.py:348-497`` RCU + fusion,
  ``dpt.py:185-267`` depth/seg heads, ``SOccDPT.py:660-674`` V3 seg
  head), imported with ``timm`` stubbed out and driven with random
  weights that are pushed through ``core.torch_import`` into the flax
  modules — activations must agree; and
* HuggingFace ``transformers``' independent SwinV2 implementation
  (scaled-cosine window attention, CPB MLP, post-norm block, patch
  merging), which shares no code with this repo, as the oracle for the
  Swin2 backbone math.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from soccdpt_tpu.core.torch_import import (  # noqa: E402
    convert_seg_head_keys,
    convert_seg_output_conv_keys,
    convert_swin2_dpt_keys,
    merge_into,
    _nest,
)

RTOL, ATOL = 1e-5, 2e-5


# ---------------------------------------------------------------------------
# Reference import machinery (timm stubbed; reference code is the oracle)
# ---------------------------------------------------------------------------


def _install_timm_stub():
    """The reference imports timm at module scope but the decoder classes
    never touch it; a stub makes ``SOccDPT.model.blocks``/``dpt``
    importable without timm."""
    if "timm" in sys.modules:
        return
    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    timm = _mod("timm")
    timm.create_model = None
    models = _mod("timm.models")
    layers = _mod("timm.models.layers")
    layers.get_act_layer = lambda name: tnn.Hardswish
    beit = _mod("timm.models.beit")
    beit.gen_relative_position_index = None
    timm.models = models
    models.layers = layers
    models.beit = beit
    sys.modules.update(
        {
            "timm": timm,
            "timm.models": models,
            "timm.models.layers": layers,
            "timm.models.beit": beit,
        }
    )


@pytest.fixture(scope="module")
def ref():
    """Reference modules loaded from /root/reference (read-only)."""
    _install_timm_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import SOccDPT.model.blocks as blocks
    import SOccDPT.model.dpt as dpt
    from SOccDPT.model.scaled_tanh import ScaledTanh

    return types.SimpleNamespace(blocks=blocks, dpt=dpt, ScaledTanh=ScaledTanh)


def _t2n(t):
    return t.detach().numpy()


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _nhwc(t_nchw):
    return np.transpose(_t2n(t_nchw), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Fixed-feature flax backbone (the decoder is the unit under test)
# ---------------------------------------------------------------------------

from flax import linen as nn  # noqa: E402


def _feat(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape, dtype=np.float32)


class ConstBackbone(nn.Module):
    """Returns deterministic NHWC stage features regardless of input.

    Features live in params with rng-independent initializers, so a
    fresh ``init`` + lenient merge leaves them intact.
    """

    shapes: tuple  # ((H, W, C), ...)

    @nn.compact
    def __call__(self, x, deterministic=True):
        B = x.shape[0]
        outs = []
        for i, s in enumerate(self.shapes):
            f = self.param(
                f"feat{i}", lambda rng, s=s, i=i: jnp.asarray(_feat(s, 100 + i))
            )
            outs.append(jnp.broadcast_to(f[None], (B,) + tuple(s)))
        return tuple(outs)


STAGE_SHAPES = ((16, 16, 8), (8, 8, 16), (4, 4, 32), (2, 2, 64))
IN_CHANNELS = tuple(s[-1] for s in STAGE_SHAPES)
FEATURES = 32


class _TorchRefDecoder(tnn.Module):
    """Torch-side harness wiring the reference's *own* decoder modules
    exactly as ``DPT.forward`` does (reference dpt.py:142-177), with the
    checkpoint's key layout (everything under ``scratch.``)."""

    def __init__(self, ref, head, use_bn):
        super().__init__()
        scratch = tnn.Module()
        for i, c in enumerate(IN_CHANNELS):
            setattr(
                scratch,
                f"layer{i + 1}_rn",
                tnn.Conv2d(c, FEATURES, 3, padding=1, bias=False),
            )
        for k in range(1, 5):
            setattr(
                scratch, f"refinenet{k}", ref.dpt._make_fusion_block(FEATURES, use_bn)
            )
        scratch.output_conv = head
        self.scratch = scratch

    def forward(self, l1, l2, l3, l4):
        l1rn = self.scratch.layer1_rn(l1)
        l2rn = self.scratch.layer2_rn(l2)
        l3rn = self.scratch.layer3_rn(l3)
        l4rn = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(l4rn, size=l3rn.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3rn, size=l2rn.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2rn, size=l1rn.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1rn)
        return self.scratch.output_conv(p1), p1


def _randomize_bn_stats(module, seed=5):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def _import_decoder_into_flax(model, torch_module, x):
    """state_dict -> importer -> lenient merge into a fresh flax init."""
    sd = {k: _t2n(v) for k, v in torch_module.state_dict().items()}
    p, s = convert_swin2_dpt_keys(sd, torch_prefix="")
    variables = model.init(jax.random.PRNGKey(0), x)
    params = merge_into(
        jax.device_get(variables["params"]), _nest(p), verbose=False
    )
    out_vars = {"params": params}
    if "batch_stats" in variables:
        out_vars["batch_stats"] = merge_into(
            jax.device_get(variables["batch_stats"]), _nest(s), verbose=False
        )
    return out_vars


@pytest.mark.parametrize("use_bn", [False, True])
def test_fusion_decoder_and_depth_head_parity(ref, use_bn):
    """Reference fusion decoder + depth head (dpt.py:142-232) executing
    in torch vs the flax DPT through the weight importer."""
    from functools import partial

    from soccdpt_tpu.models.dpt import DPT
    from soccdpt_tpu.models.heads import DepthHead

    torch.manual_seed(0)
    head = tnn.Sequential(
        tnn.Conv2d(FEATURES, FEATURES // 2, kernel_size=3, stride=1, padding=1),
        ref.blocks.Interpolate(scale_factor=2, mode="bilinear", align_corners=True),
        tnn.Conv2d(FEATURES // 2, 16, kernel_size=3, stride=1, padding=1),
        tnn.ReLU(True),
        tnn.Conv2d(16, 1, kernel_size=1, stride=1, padding=0),
        tnn.ReLU(True),
        tnn.Identity(),
    )  # reference dpt.py:199-219 with head_features_2=16
    tdec = _TorchRefDecoder(ref, head, use_bn)
    if use_bn:
        with torch.no_grad():
            _randomize_bn_stats(tdec)
    tdec.eval()

    B = 2
    feats = [np.broadcast_to(_feat(s, 100 + i)[None], (B,) + s) for i, s in
             enumerate(STAGE_SHAPES)]
    with torch.no_grad():
        t_out, t_path = tdec(*[torch.tensor(_nchw(f)) for f in feats])

    model = DPT(
        backbone=partial(ConstBackbone, shapes=STAGE_SHAPES),
        in_channels=IN_CHANNELS,
        head=partial(DepthHead, head_features_1=FEATURES, head_features_2=16),
        features=FEATURES,
        use_bn=use_bn,
        return_features=True,
    )
    x = jnp.zeros((B, 4, 4, 3))
    variables = _import_decoder_into_flax(model, tdec, x)
    out, path = model.apply(variables, x, deterministic=True)

    np.testing.assert_allclose(
        _nchw(path), _t2n(t_path), rtol=RTOL, atol=ATOL, err_msg="pre-head features"
    )
    np.testing.assert_allclose(
        _nchw(out), _t2n(t_out), rtol=RTOL, atol=ATOL, err_msg="depth head output"
    )


def test_seg_output_conv_head_parity(ref):
    """Reference DPTSegmentationModel head (dpt.py:242-252) vs the flax
    SegHead through convert_seg_output_conv_keys (the V1 seg_net path)."""
    from soccdpt_tpu.models.heads import SegHead

    torch.manual_seed(1)
    num_classes = 3
    head = tnn.Sequential(
        tnn.Conv2d(FEATURES, FEATURES, kernel_size=3, padding=1, bias=False),
        tnn.BatchNorm2d(FEATURES),
        tnn.ReLU(True),
        tnn.Dropout(0.1, False),
        tnn.Conv2d(FEATURES, num_classes, kernel_size=1),
        ref.blocks.Interpolate(scale_factor=2, mode="bilinear", align_corners=True),
        tnn.Sigmoid(),
    )
    with torch.no_grad():
        _randomize_bn_stats(head)
    # BatchNorm2d lives at index 1; _randomize only touches BatchNorm2d.
    head.eval()

    feat = _feat((2, 8, 8, FEATURES), 7)
    with torch.no_grad():
        t_out = head(torch.tensor(_nchw(feat)))

    sd = {f"scratch.output_conv.{k}": _t2n(v) for k, v in head.state_dict().items()}
    p, s = convert_seg_output_conv_keys(sd, torch_prefix="")

    model = SegHead(num_classes=num_classes, features=FEATURES)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feat))
    params = merge_into(
        jax.device_get(variables["params"]), _nest(p)["head"], verbose=False
    )
    stats = merge_into(
        jax.device_get(variables["batch_stats"]), _nest(s)["head"], verbose=False
    )
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(feat),
        deterministic=True,
    )
    np.testing.assert_allclose(_nchw(out), _t2n(t_out), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("sigmoid", [True, False])
def test_v3_seg_head_parity(ref, sigmoid):
    """Reference SOccDPT_V3 seg head (SOccDPT.py:660-674) vs the flax
    SegHead through convert_seg_head_keys, both activations."""
    from soccdpt_tpu.models.heads import SegHead

    torch.manual_seed(2)
    num_classes = 3
    activation = tnn.Sigmoid() if sigmoid else ref.ScaledTanh()
    head = tnn.Sequential(
        tnn.Conv2d(FEATURES, FEATURES, kernel_size=3, padding=1, bias=False),
        tnn.BatchNorm2d(FEATURES),
        tnn.ReLU(True),
        tnn.Dropout(0.1, False),
        tnn.Conv2d(FEATURES, num_classes, kernel_size=1),
        ref.blocks.Interpolate(scale_factor=2, mode="bilinear", align_corners=True),
        activation,
    )
    with torch.no_grad():
        _randomize_bn_stats(head, seed=11)
    head.eval()

    feat = _feat((1, 8, 8, FEATURES), 13)
    with torch.no_grad():
        t_out = head(torch.tensor(_nchw(feat)))

    sd = {f"seg_head.{k}": _t2n(v) for k, v in head.state_dict().items()}
    p, s = convert_seg_head_keys(sd, torch_prefix="seg_head.")

    model = SegHead(num_classes=num_classes, features=FEATURES, sigmoid=sigmoid)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feat))
    params = merge_into(jax.device_get(variables["params"]), _nest(p), verbose=False)
    stats = merge_into(
        jax.device_get(variables["batch_stats"]), _nest(s), verbose=False
    )
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(feat),
        deterministic=True,
    )
    np.testing.assert_allclose(_nchw(out), _t2n(t_out), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# SwinV2 math vs HuggingFace transformers (independent implementation)
# ---------------------------------------------------------------------------


def _hf():
    mod = pytest.importorskip("transformers.models.swinv2.modeling_swinv2")
    from transformers.models.swinv2.configuration_swinv2 import Swinv2Config

    return mod, Swinv2Config


def _hf_config(C, heads, window):
    _, Swinv2Config = _hf()
    return Swinv2Config(
        embed_dim=C,
        num_heads=[heads],
        window_size=window,
        qkv_bias=True,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        drop_path_rate=0.0,
        hidden_act="gelu",
        layer_norm_eps=1e-5,
        mlp_ratio=4.0,
    )


def _copy_attn_weights(hf_attn, hf_out, aparams):
    """flax WindowAttentionV2 params -> HF Swinv2SelfAttention(+Output)."""
    C = aparams["qkv"]["kernel"].shape[0]
    k = np.asarray(aparams["qkv"]["kernel"])  # (C, 3C), [q|k|v] columns
    with torch.no_grad():
        hf_attn.query.weight.copy_(torch.tensor(k[:, :C].T))
        hf_attn.key.weight.copy_(torch.tensor(k[:, C : 2 * C].T))
        hf_attn.value.weight.copy_(torch.tensor(k[:, 2 * C :].T))
        hf_attn.query.bias.copy_(torch.tensor(np.asarray(aparams["q_bias"])))
        hf_attn.value.bias.copy_(torch.tensor(np.asarray(aparams["v_bias"])))
        hf_attn.logit_scale.copy_(torch.tensor(np.asarray(aparams["logit_scale"])))
        mlp = hf_attn.continuous_position_bias_mlp
        mlp[0].weight.copy_(
            torch.tensor(np.asarray(aparams["cpb_mlp_0"]["kernel"]).T)
        )
        mlp[0].bias.copy_(torch.tensor(np.asarray(aparams["cpb_mlp_0"]["bias"])))
        mlp[2].weight.copy_(
            torch.tensor(np.asarray(aparams["cpb_mlp_1"]["kernel"]).T)
        )
        if hf_out is not None:
            hf_out.dense.weight.copy_(
                torch.tensor(np.asarray(aparams["proj"]["kernel"]).T)
            )
            hf_out.dense.bias.copy_(
                torch.tensor(np.asarray(aparams["proj"]["bias"]))
            )


@pytest.mark.parametrize("masked", [False, True])
def test_swinv2_window_attention_vs_hf(masked):
    """Scaled-cosine window attention + CPB MLP vs HF Swinv2SelfAttention.

    HF adds the shift mask twice (modeling_swinv2.py:514-517, -200 vs
    timm's -100); both saturate the softmax identically, so outputs
    still agree to float tolerance.
    """
    mod, _ = _hf()
    from soccdpt_tpu.models.backbones.swin2 import (
        WindowAttentionV2,
        shifted_window_attn_mask,
    )

    C, heads, window = 32, 4, 4
    N = window * window
    nW = 4  # windows per image (8x8 grid)
    B = 2

    model = WindowAttentionV2(dim=C, num_heads=heads, window=(window, window))
    x = _feat((B * nW, N, C), 21)
    mask_np = (
        shifted_window_attn_mask(8, 8, window, window, 2, 2) if masked else None
    )
    mask = None if mask_np is None else jnp.asarray(mask_np)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x), mask)
    out = model.apply(variables, jnp.asarray(x), mask)

    cfg = _hf_config(C, heads, window)
    hf_attn = mod.Swinv2SelfAttention(
        cfg, dim=C, num_heads=heads, window_size=window,
        pretrained_window_size=[0, 0],
    )
    hf_out = mod.Swinv2SelfOutput(cfg, C)
    _copy_attn_weights(hf_attn, hf_out, jax.device_get(variables["params"]))
    hf_attn.eval(), hf_out.eval()
    with torch.no_grad():
        t_mask = None if mask_np is None else torch.tensor(mask_np)
        ctx = hf_attn(torch.tensor(x), attention_mask=t_mask)[0]
        t_out = hf_out(ctx, None)

    np.testing.assert_allclose(np.asarray(out), _t2n(t_out), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize(
    "res,shift", [((8, 8), False), ((8, 8), True), ((4, 4), True)]
)
def test_swinv2_block_vs_hf(res, shift):
    """Full post-norm SwinV2 block vs HF Swinv2Layer: plain, shifted,
    and window-covers-stage (clamped, shift disabled) cases.

    Non-window-divisible grids are deliberately NOT compared: there HF
    lets real tokens attend to zero-padded tokens while this repo masks
    padding out (swin2.shifted_window_attn_mask). The reference never
    pads (its transforms keep inputs window-divisible at every stage),
    so masked padding is a documented extension, covered by
    test_backbones' non-divisible-grid tests.
    """
    mod, _ = _hf()
    from soccdpt_tpu.models.backbones.swin2 import SwinV2Block

    C, heads, window = 32, 4, 4
    Hr, Wr = res
    model = SwinV2Block(
        dim=C,
        num_heads=heads,
        input_resolution=(Hr, Wr),
        window_size=window,
        shift=shift,
        pretrained_window_size=0,
        mlp_ratio=4.0,
        drop_path_rate=0.0,
    )
    x = _feat((2, Hr, Wr, C), 33)
    variables = model.init(jax.random.PRNGKey(5), jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x), deterministic=True)

    cfg = _hf_config(C, heads, window)
    layer = mod.Swinv2Layer(
        cfg,
        dim=C,
        input_resolution=(Hr, Wr),
        num_heads=heads,
        shift_size=window // 2 if shift else 0,
        pretrained_window_size=0,
    )
    p = jax.device_get(variables["params"])
    _copy_attn_weights(layer.attention.self, layer.attention.output, p["attn"])
    with torch.no_grad():
        layer.layernorm_before.weight.copy_(
            torch.tensor(np.asarray(p["norm1"]["scale"]))
        )
        layer.layernorm_before.bias.copy_(
            torch.tensor(np.asarray(p["norm1"]["bias"]))
        )
        layer.layernorm_after.weight.copy_(
            torch.tensor(np.asarray(p["norm2"]["scale"]))
        )
        layer.layernorm_after.bias.copy_(
            torch.tensor(np.asarray(p["norm2"]["bias"]))
        )
        layer.intermediate.dense.weight.copy_(
            torch.tensor(np.asarray(p["mlp_fc1"]["kernel"]).T)
        )
        layer.intermediate.dense.bias.copy_(
            torch.tensor(np.asarray(p["mlp_fc1"]["bias"]))
        )
        layer.output.dense.weight.copy_(
            torch.tensor(np.asarray(p["mlp_fc2"]["kernel"]).T)
        )
        layer.output.dense.bias.copy_(
            torch.tensor(np.asarray(p["mlp_fc2"]["bias"]))
        )
    layer.eval()
    with torch.no_grad():
        t_out = layer(
            torch.tensor(x.reshape(2, Hr * Wr, C)), (Hr, Wr)
        )[0]

    np.testing.assert_allclose(
        np.asarray(out).reshape(2, Hr * Wr, C), _t2n(t_out), rtol=RTOL, atol=ATOL
    )


def test_swinv2_patch_merging_vs_hf():
    mod, _ = _hf()
    from soccdpt_tpu.models.backbones.swin2 import PatchMerging

    C, H, W = 16, 8, 8
    x = _feat((2, H, W, C), 44)
    model = PatchMerging()
    variables = model.init(jax.random.PRNGKey(6), jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x))

    pm = mod.Swinv2PatchMerging((H, W), C)
    p = jax.device_get(variables["params"])
    with torch.no_grad():
        pm.reduction.weight.copy_(
            torch.tensor(np.asarray(p["reduction"]["kernel"]).T)
        )
        pm.norm.weight.copy_(torch.tensor(np.asarray(p["norm"]["scale"])))
        pm.norm.bias.copy_(torch.tensor(np.asarray(p["norm"]["bias"])))
    pm.eval()
    with torch.no_grad():
        t_out = pm(torch.tensor(x.reshape(2, H * W, C)), (H, W))

    np.testing.assert_allclose(
        np.asarray(out).reshape(2, (H // 2) * (W // 2), 2 * C),
        _t2n(t_out),
        rtol=RTOL,
        atol=ATOL,
    )


def test_rcu_bn_import_keys():
    """The importer maps RCU BatchNorm keys (bn=True decoders) into
    params + batch_stats."""
    sd = {
        "scratch.refinenet2.resConfUnit1.bn1.weight": np.ones(4, np.float32),
        "scratch.refinenet2.resConfUnit1.bn1.bias": np.zeros(4, np.float32),
        "scratch.refinenet2.resConfUnit1.bn1.running_mean": np.full(4, 0.5, np.float32),
        "scratch.refinenet2.resConfUnit1.bn1.running_var": np.full(4, 2.0, np.float32),
    }
    p, s = convert_swin2_dpt_keys(sd)
    assert p[("refinenet2", "res_conv_unit1", "bn1", "scale")].shape == (4,)
    np.testing.assert_array_equal(
        s[("refinenet2", "res_conv_unit1", "bn1", "mean")], np.full(4, 0.5)
    )
    np.testing.assert_array_equal(
        s[("refinenet2", "res_conv_unit1", "bn1", "var")], np.full(4, 2.0)
    )


# ---------------------------------------------------------------------------
# LeViT attention vs HuggingFace transformers (independent implementation)
# ---------------------------------------------------------------------------


def _set_bndense(tree, stats, hf_mlp_bn):
    """Copy an HF MLPLayerWithBN (linear+BatchNorm1d) into a flax BNDense
    subtree (params `tree`, batch_stats `stats`)."""
    tree["linear"]["kernel"] = _t2n(hf_mlp_bn.linear.weight).T
    tree["bn"]["scale"] = _t2n(hf_mlp_bn.batch_norm.weight)
    tree["bn"]["bias"] = _t2n(hf_mlp_bn.batch_norm.bias)
    stats["bn"]["mean"] = _t2n(hf_mlp_bn.batch_norm.running_mean)
    stats["bn"]["var"] = _t2n(hf_mlp_bn.batch_norm.running_var)


def _randomize_levit_module(mod, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for m in mod.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_levit_attention_vs_hf():
    """Fused-qkv LeViT attention (per-head [q|k|v] split, learned
    position biases in first-seen offset order) vs HF LevitAttention."""
    mod = pytest.importorskip("transformers.models.levit.modeling_levit")
    from soccdpt_tpu.models.backbones.levit import LeViTAttention

    C, kd, H, ratio, res = 32, 8, 2, 2, 4
    hf = mod.LevitAttention(
        hidden_sizes=C, key_dim=kd, num_attention_heads=H,
        attention_ratio=ratio, resolution=res,
    )
    _randomize_levit_module(hf, 51)
    hf.eval()

    x = _feat((2, res * res, C), 52)
    with torch.no_grad():
        t_out = hf(torch.tensor(x))

    model = LeViTAttention(
        dim_out=C, num_heads=H, key_dim=kd, attn_ratio=float(ratio),
        grid=(res, res),
    )
    variables = jax.device_get(model.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    p, s = variables["params"], variables["batch_stats"]
    _set_bndense(p["qkv"], s["qkv"], hf.queries_keys_values)
    _set_bndense(p["proj"], s["proj"], hf.projection)
    p["attn_bias"] = _t2n(hf.attention_biases)
    out = model.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(out), _t2n(t_out), rtol=RTOL, atol=ATOL)


def test_levit_attention_subsample_vs_hf():
    """Strided-query downsample attention vs HF LevitAttentionSubsample."""
    mod = pytest.importorskip("transformers.models.levit.modeling_levit")
    from soccdpt_tpu.models.backbones.levit import LeViTAttention

    C, C_out, kd, H, ratio, res = 32, 48, 8, 2, 4, 4
    hf = mod.LevitAttentionSubsample(
        input_dim=C, output_dim=C_out, key_dim=kd, num_attention_heads=H,
        attention_ratio=ratio, stride=2, resolution_in=res,
        resolution_out=res // 2,
    )
    _randomize_levit_module(hf, 61)
    hf.eval()

    x = _feat((2, res * res, C), 62)
    with torch.no_grad():
        t_out = hf(torch.tensor(x))

    model = LeViTAttention(
        dim_out=C_out, num_heads=H, key_dim=kd, attn_ratio=float(ratio),
        grid=(res, res), q_stride=2,
    )
    variables = jax.device_get(model.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    p, s = variables["params"], variables["batch_stats"]
    _set_bndense(p["kv"], s["kv"], hf.keys_values)
    _set_bndense(p["q"], s["q"], hf.queries)
    _set_bndense(p["proj"], s["proj"], hf.projection)
    p["attn_bias"] = _t2n(hf.attention_biases)
    out = model.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(out), _t2n(t_out), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# ViT/BEiT act_postprocess pyramid vs the reference's OWN torch modules
# ---------------------------------------------------------------------------


def test_vit_act_postprocess_pyramid_vs_reference(ref):
    """The 4-level act_postprocess pyramid (ProjectReadout + 1x1 conv +
    4x/2x conv-transpose / stride-2 conv; reference backbones/utils.py:
    154-269) executing in the reference's own torch code vs the flax
    ViTBackbone pyramid, weights pushed through convert_vit_dpt_keys.
    Combined with the whole-trunk HF test this covers the full ViT
    backbone composition."""
    import SOccDPT.model.backbones.utils as ref_utils

    from soccdpt_tpu.core.torch_import import convert_vit_dpt_keys
    from soccdpt_tpu.models.backbones.vit import VIT_HOOKS, make_vit_backbone

    name = "vittest_64"
    hooks = VIT_HOOKS[name]
    factory, post_channels = make_vit_backbone(name, use_pallas=False)
    model = factory()
    C = model.cfg.embed_dim
    gh = gw = 64 // model.cfg.patch_size

    # reference builder needs only .blocks for hook registration
    dummy = tnn.Module()
    dummy.blocks = tnn.ModuleList([tnn.Identity() for _ in range(4)])
    torch.manual_seed(7)
    pretrained = ref_utils.make_backbone_default(
        dummy,
        features=list(post_channels),
        size=[gh * 16, gw * 16],  # size//16 == our patch grid
        hooks=[0, 1, 2, 3],
        vit_features=C,
        use_readout="project",
    )
    posts = [getattr(pretrained, f"act_postprocess{k}") for k in (1, 2, 3, 4)]

    # flax backbone with random trunk + IMPORTED pyramid weights
    x = jnp.asarray(_feat((2, 64, 64, 3), 99))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    sd = {}
    for k, post in enumerate(posts, start=1):
        for pname, t in post.state_dict().items():
            sd[f"pretrained.act_postprocess{k}.{pname}"] = _t2n(t)
    p, _ = convert_vit_dpt_keys(sd)
    nested = _nest({key[1:]: v for key, v in p.items()})  # strip "backbone"
    params = merge_into(
        jax.device_get(variables["params"]), nested, verbose=False
    )
    variables = {"params": params}

    feats, inter = model.apply(
        variables,
        x,
        deterministic=True,
        capture_intermediates=lambda mod, method: (
            method == "__call__" and (mod.name or "").startswith("block")
        ),
        mutable=["intermediates"],
    )

    for lvl, (h, got) in enumerate(zip(hooks, feats)):
        tokens = np.asarray(
            inter["intermediates"][f"block{h}"]["__call__"][0]
        )
        with torch.no_grad():
            want = posts[lvl](torch.tensor(tokens))
        np.testing.assert_allclose(
            _nchw(got), _t2n(want), rtol=RTOL, atol=ATOL,
            err_msg=f"act_postprocess{lvl + 1}",
        )


def test_toeplitz_bias_expand_matches_gather():
    """The scatter-free Toeplitz expansion must equal the gather
    formulation cpb[relative_position_index] bit-for-bit (one-hot
    matmuls are exact), including a table window larger than the
    effective window (swin1's resolution-clamped case)."""
    import jax.numpy as jnp

    from soccdpt_tpu.models.backbones.swin2 import (
        relative_position_index,
        toeplitz_bias_expand,
    )

    rng = np.random.default_rng(5)
    for wh, ww, twh, tww, H in [(7, 7, None, None, 4), (4, 6, None, None, 3),
                                (5, 5, 8, 8, 2)]:
        twh_e = wh if twh is None else twh
        tww_e = ww if tww is None else tww
        M = (2 * twh_e - 1) * (2 * tww_e - 1)
        cpb = rng.standard_normal((M, H)).astype(np.float32)
        rpi = relative_position_index(wh, ww, twh, tww)
        want = cpb[rpi.reshape(-1)].reshape(wh * ww, wh * ww, H)
        want = np.transpose(want, (2, 0, 1))
        got = np.asarray(
            toeplitz_bias_expand(jnp.asarray(cpb), wh, ww, twh, tww)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"{wh}x{ww}")
