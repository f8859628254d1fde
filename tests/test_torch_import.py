"""Torch-checkpoint importer tests.

Builds a synthetic torch-layout state dict (reference/timm key naming,
torch weight layouts) from a randomly-initialized flax model, runs the
importer, and checks the round trip reproduces every leaf — validating
the name mapping and the layout transposes are mutually consistent.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soccdpt_tpu.core.config import CameraConfig, ModelConfig
from soccdpt_tpu.core.torch_import import (
    import_soccdpt_v3,
    merge_into,
)
from soccdpt_tpu.models.soccdpt import build_model

TEST_CAMERA = CameraConfig(fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48)


def _to_torch_sd(params, batch_stats):
    """flax tree -> torch-naming state dict (the inverse of the importer)."""
    sd = {}

    def conv(k):
        return np.transpose(k, (3, 2, 0, 1))

    def dense(k):
        return np.transpose(k, (1, 0))

    bb = params["depth_net"]["backbone"]
    sd["depth_net.pretrained.model.patch_embed.proj.weight"] = conv(
        bb["patch_embed"]["kernel"]
    )
    sd["depth_net.pretrained.model.patch_embed.proj.bias"] = bb["patch_embed"]["bias"]
    sd["depth_net.pretrained.model.patch_embed.norm.weight"] = bb["patch_norm"]["scale"]
    sd["depth_net.pretrained.model.patch_embed.norm.bias"] = bb["patch_norm"]["bias"]
    for name, blk in bb.items():
        if name.startswith("stage"):
            i, j = int(name[5]), int(name.split("block")[1])
            p = f"depth_net.pretrained.model.layers.{i}.blocks.{j}."
            a = blk["attn"]
            sd[p + "attn.qkv.weight"] = dense(a["qkv"]["kernel"])
            sd[p + "attn.q_bias"] = a["q_bias"]
            sd[p + "attn.v_bias"] = a["v_bias"]
            sd[p + "attn.logit_scale"] = a["logit_scale"]
            sd[p + "attn.proj.weight"] = dense(a["proj"]["kernel"])
            sd[p + "attn.proj.bias"] = a["proj"]["bias"]
            sd[p + "attn.cpb_mlp.0.weight"] = dense(a["cpb_mlp_0"]["kernel"])
            sd[p + "attn.cpb_mlp.0.bias"] = a["cpb_mlp_0"]["bias"]
            sd[p + "attn.cpb_mlp.2.weight"] = dense(a["cpb_mlp_1"]["kernel"])
            sd[p + "norm1.weight"] = blk["norm1"]["scale"]
            sd[p + "norm1.bias"] = blk["norm1"]["bias"]
            sd[p + "norm2.weight"] = blk["norm2"]["scale"]
            sd[p + "norm2.bias"] = blk["norm2"]["bias"]
            sd[p + "mlp.fc1.weight"] = dense(blk["mlp_fc1"]["kernel"])
            sd[p + "mlp.fc1.bias"] = blk["mlp_fc1"]["bias"]
            sd[p + "mlp.fc2.weight"] = dense(blk["mlp_fc2"]["kernel"])
            sd[p + "mlp.fc2.bias"] = blk["mlp_fc2"]["bias"]
        elif name.startswith("downsample"):
            i = int(name[len("downsample"):])
            p = f"depth_net.pretrained.model.layers.{i}.downsample."
            sd[p + "reduction.weight"] = dense(blk["reduction"]["kernel"])
            sd[p + "norm.weight"] = blk["norm"]["scale"]
            sd[p + "norm.bias"] = blk["norm"]["bias"]

    dn = params["depth_net"]
    for k in range(1, 5):
        sd[f"depth_net.scratch.layer{k}_rn.weight"] = conv(
            dn[f"layer{k}_rn"]["kernel"]
        )
        rn = dn[f"refinenet{k}"]
        # refinenet4 takes no lateral skip, so flax lazily creates only
        # res_conv_unit2 (torch declares both; the unused one is ignored
        # by the lenient merge).
        for u in (1, 2):
            if f"res_conv_unit{u}" not in rn:
                continue
            for c in (1, 2):
                sd[
                    f"depth_net.scratch.refinenet{k}.resConfUnit{u}.conv{c}.weight"
                ] = conv(rn[f"res_conv_unit{u}"][f"conv{c}"]["kernel"])
                sd[
                    f"depth_net.scratch.refinenet{k}.resConfUnit{u}.conv{c}.bias"
                ] = rn[f"res_conv_unit{u}"][f"conv{c}"]["bias"]
        sd[f"depth_net.scratch.refinenet{k}.out_conv.weight"] = conv(
            rn["out_conv"]["kernel"]
        )
        sd[f"depth_net.scratch.refinenet{k}.out_conv.bias"] = rn["out_conv"]["bias"]

    head = dn["head"]
    for idx, cname in ((0, "conv1"), (2, "conv2"), (4, "conv3")):
        sd[f"depth_net.scratch.output_conv.{idx}.weight"] = conv(
            head[cname]["kernel"]
        )
        sd[f"depth_net.scratch.output_conv.{idx}.bias"] = head[cname]["bias"]

    sh = params["seg_head"]
    sd["seg_head.0.weight"] = conv(sh["conv1"]["kernel"])
    sd["seg_head.1.weight"] = sh["bn"]["scale"]
    sd["seg_head.1.bias"] = sh["bn"]["bias"]
    sd["seg_head.1.running_mean"] = batch_stats["seg_head"]["bn"]["mean"]
    sd["seg_head.1.running_var"] = batch_stats["seg_head"]["bn"]["var"]
    sd["seg_head.4.weight"] = conv(sh["conv2"]["kernel"])
    sd["seg_head.4.bias"] = sh["conv2"]["bias"]
    return {k: np.asarray(v) for k, v in sd.items()}


def test_v3_roundtrip():
    cfg = ModelConfig(
        model_type="dpt_swin2_test_64", version=3, features=64, camera=TEST_CAMERA
    )
    model = build_model(cfg)
    x = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(7), x, return_raw=True)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    sd = _to_torch_sd(params, stats)
    imported_params, imported_stats = import_soccdpt_v3(sd)

    # Merge into a freshly-initialized model (different rng), then compare
    # every imported leaf against the original.
    fresh = jax.device_get(
        model.init(jax.random.PRNGKey(1), x, return_raw=True)["params"]
    )
    merged = merge_into(fresh, imported_params, verbose=False)

    want_leaves = jax.tree_util.tree_leaves_with_path(params)
    got = dict(jax.tree_util.tree_leaves_with_path(merged))
    n_checked = 0
    for path, w in want_leaves:
        g = got[path]
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), err_msg=str(path))
        n_checked += 1
    assert n_checked == len(want_leaves)

    # batch_stats import
    merged_stats = merge_into(
        jax.device_get(
            model.init(jax.random.PRNGKey(1), x, return_raw=True)["batch_stats"]
        ),
        imported_stats,
        verbose=False,
    )
    np.testing.assert_allclose(
        np.asarray(merged_stats["seg_head"]["bn"]["mean"]),
        np.asarray(stats["seg_head"]["bn"]["mean"]),
    )


def test_merge_reports_and_keeps_on_mismatch():
    target = {"a": {"kernel": np.zeros((2, 2), np.float32)}}
    imported = {"a": {"kernel": np.ones((3, 3), np.float32)}}
    out = merge_into(target, imported, verbose=False)
    np.testing.assert_array_equal(out["a"]["kernel"], np.zeros((2, 2)))


def _build(version):
    cfg = ModelConfig(
        model_type="dpt_swin2_test_64", version=version, features=64,
        camera=TEST_CAMERA,
    )
    model = build_model(cfg)
    x = jnp.zeros((1, 3, 64, 64))
    v = model.init(jax.random.PRNGKey(3), x, return_raw=True)
    return model, jax.device_get(v["params"]), jax.device_get(v["batch_stats"])


def test_v2_import_depth_head_and_seg_ead_alias():
    """V2 importer handles the reference's seg_ead typo and depth_head
    Sequential indices."""
    from soccdpt_tpu.core.torch_import import import_soccdpt_v2

    _, params, stats = _build(2)

    def conv(k):
        return np.transpose(k, (3, 2, 0, 1))

    sd = {}
    dh = params["depth_head"]
    for idx, name in ((0, "conv1"), (2, "conv2"), (4, "conv3")):
        sd[f"depth_head.{idx}.weight"] = conv(dh[name]["kernel"])
        sd[f"depth_head.{idx}.bias"] = dh[name]["bias"]
    sh = params["seg_head"]
    sd["seg_ead.0.weight"] = conv(sh["conv1"]["kernel"])  # reference typo
    sd["seg_ead.1.weight"] = sh["bn"]["scale"]
    sd["seg_ead.1.bias"] = sh["bn"]["bias"]
    sd["seg_ead.1.running_mean"] = stats["seg_head"]["bn"]["mean"]
    sd["seg_ead.1.running_var"] = stats["seg_head"]["bn"]["var"]
    sd["seg_ead.4.weight"] = conv(sh["conv2"]["kernel"])
    sd["seg_ead.4.bias"] = sh["conv2"]["bias"]

    p, s = import_soccdpt_v2({k: np.asarray(v) for k, v in sd.items()})
    fresh = _build(2)[1]
    merged = merge_into(fresh, p, verbose=False)
    np.testing.assert_allclose(
        merged["depth_head"]["conv1"]["kernel"], dh["conv1"]["kernel"]
    )
    np.testing.assert_allclose(
        merged["seg_head"]["conv2"]["kernel"], sh["conv2"]["kernel"]
    )


def test_v1_import_two_networks():
    from soccdpt_tpu.core.torch_import import import_soccdpt_v1

    _, params, stats = _build(1)

    def conv(k):
        return np.transpose(k, (3, 2, 0, 1))

    sd = {}
    # depth head of depth_net
    dh = params["depth_net"]["head"]
    for idx, name in ((0, "conv1"), (2, "conv2"), (4, "conv3")):
        sd[f"depth_net.scratch.output_conv.{idx}.weight"] = conv(dh[name]["kernel"])
        sd[f"depth_net.scratch.output_conv.{idx}.bias"] = dh[name]["bias"]
    # seg head of seg_net
    sh = params["seg_net"]["head"]
    sd["seg_net.scratch.output_conv.0.weight"] = conv(sh["conv1"]["kernel"])
    sd["seg_net.scratch.output_conv.1.weight"] = sh["bn"]["scale"]
    sd["seg_net.scratch.output_conv.1.bias"] = sh["bn"]["bias"]
    sd["seg_net.scratch.output_conv.1.running_mean"] = stats["seg_net"]["head"]["bn"]["mean"]
    sd["seg_net.scratch.output_conv.1.running_var"] = stats["seg_net"]["head"]["bn"]["var"]
    sd["seg_net.scratch.output_conv.4.weight"] = conv(sh["conv2"]["kernel"])
    sd["seg_net.scratch.output_conv.4.bias"] = sh["conv2"]["bias"]

    p, s = import_soccdpt_v1({k: np.asarray(v) for k, v in sd.items()})
    fresh = _build(1)[1]
    merged = merge_into(fresh, p, verbose=False)
    np.testing.assert_allclose(
        merged["depth_net"]["head"]["conv1"]["kernel"], dh["conv1"]["kernel"]
    )
    np.testing.assert_allclose(
        merged["seg_net"]["head"]["conv1"]["kernel"], sh["conv1"]["kernel"]
    )


def test_vit_dpt_import_roundtrip():
    """ViT-family DPT importer round-trip (MiDaS dpt_large layout)."""
    from soccdpt_tpu.core.torch_import import import_dpt_vit_depth_model
    from soccdpt_tpu.models.backbones.vit import make_vit_backbone
    from soccdpt_tpu.models.dpt import DPT
    from soccdpt_tpu.models.heads import DepthHead
    from functools import partial

    factory, chans = make_vit_backbone("vittest_64")
    model = DPT(
        backbone=factory, in_channels=chans, head=partial(DepthHead),
        features=32,
    )
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.device_get(
        model.init(jax.random.PRNGKey(0), x)["params"]
    )

    def conv(k):
        return np.transpose(k, (3, 2, 0, 1))

    def conv_t(k):
        # inverse of torch_import._conv_t: flax stores the spatially
        # FLIPPED torch ConvTranspose2d kernel (correlation vs conv
        # gradient), so flip back before the layout transpose
        return np.transpose(np.ascontiguousarray(k[::-1, ::-1]), (2, 3, 0, 1))

    def dense(k):
        return np.transpose(k, (1, 0))

    bb = params["backbone"]
    sd = {
        "pretrained.model.cls_token": bb["cls_token"],
        "pretrained.model.pos_embed": bb["pos_embed"],
        "pretrained.model.patch_embed.proj.weight": conv(bb["patch_embed"]["kernel"]),
        "pretrained.model.patch_embed.proj.bias": bb["patch_embed"]["bias"],
    }
    for i in range(4):
        blk = bb[f"block{i}"]
        p = f"pretrained.model.blocks.{i}."
        sd[p + "norm1.weight"] = blk["norm1"]["scale"]
        sd[p + "norm1.bias"] = blk["norm1"]["bias"]
        sd[p + "norm2.weight"] = blk["norm2"]["scale"]
        sd[p + "norm2.bias"] = blk["norm2"]["bias"]
        sd[p + "attn.qkv.weight"] = dense(blk["qkv"]["kernel"])
        sd[p + "attn.qkv.bias"] = blk["qkv"]["bias"]
        sd[p + "attn.proj.weight"] = dense(blk["proj"]["kernel"])
        sd[p + "attn.proj.bias"] = blk["proj"]["bias"]
        sd[p + "mlp.fc1.weight"] = dense(blk["mlp_fc1"]["kernel"])
        sd[p + "mlp.fc1.bias"] = blk["mlp_fc1"]["bias"]
        sd[p + "mlp.fc2.weight"] = dense(blk["mlp_fc2"]["kernel"])
        sd[p + "mlp.fc2.bias"] = blk["mlp_fc2"]["bias"]
    for lvl in range(1, 5):
        ro = bb[f"readout{lvl}"]["project"]
        sd[f"pretrained.act_postprocess{lvl}.0.project.0.weight"] = dense(ro["kernel"])
        sd[f"pretrained.act_postprocess{lvl}.0.project.0.bias"] = ro["bias"]
        pr = bb[f"proj{lvl}"]
        sd[f"pretrained.act_postprocess{lvl}.3.weight"] = conv(pr["kernel"])
        sd[f"pretrained.act_postprocess{lvl}.3.bias"] = pr["bias"]
    sd["pretrained.act_postprocess1.4.weight"] = conv_t(bb["up4x"]["kernel"])
    sd["pretrained.act_postprocess1.4.bias"] = bb["up4x"]["bias"]
    sd["pretrained.act_postprocess2.4.weight"] = conv_t(bb["up2x"]["kernel"])
    sd["pretrained.act_postprocess2.4.bias"] = bb["up2x"]["bias"]
    sd["pretrained.act_postprocess4.4.weight"] = conv(bb["down2x"]["kernel"])
    sd["pretrained.act_postprocess4.4.bias"] = bb["down2x"]["bias"]

    p, s = import_dpt_vit_depth_model(
        {k: np.asarray(v) for k, v in sd.items()}
    )
    fresh = jax.device_get(
        model.init(jax.random.PRNGKey(9), x)["params"]
    )
    merged = merge_into(fresh, p, verbose=False)
    for path, want in jax.tree_util.tree_leaves_with_path(params["backbone"]):
        got = merged["backbone"]
        for part in path:
            got = got[part.key]
        np.testing.assert_allclose(got, want, err_msg=str(path))


def test_beit_rel_pos_table_resize():
    from soccdpt_tpu.core.torch_import import _resize_rel_pos_table

    heads = 4
    src = (6, 6)
    table = np.random.default_rng(0).standard_normal(
        ((2 * 6 - 1) ** 2 + 3, heads)
    ).astype(np.float32)
    out = _resize_rel_pos_table(table, src, (8, 8))
    assert out.shape == ((2 * 8 - 1) ** 2 + 3, heads)
    # cls rows pass through untouched
    np.testing.assert_array_equal(out[-3:], table[-3:])
    # identity resize is exact
    same = _resize_rel_pos_table(table, src, src)
    np.testing.assert_allclose(same, table)


def test_hybrid_dpt_import_roundtrip():
    """ViT-hybrid (dpt_hybrid_384 layout) importer round-trip for the
    ResNetV2 stem + ViT trunk."""
    from functools import partial

    from soccdpt_tpu.core.torch_import import import_dpt_hybrid_depth_model
    from soccdpt_tpu.models.backbones.vit_hybrid import make_vit_hybrid_backbone
    from soccdpt_tpu.models.dpt import DPT
    from soccdpt_tpu.models.heads import DepthHead

    factory, chans = make_vit_hybrid_backbone("hybridtest_64")
    model = DPT(
        backbone=factory, in_channels=chans, head=partial(DepthHead),
        features=32,
    )
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.device_get(model.init(jax.random.PRNGKey(0), x)["params"])

    def conv(k):
        return np.transpose(k, (3, 2, 0, 1))

    def dense(k):
        return np.transpose(k, (1, 0))

    bb = params["backbone"]
    sd = {
        "pretrained.model.patch_embed.backbone.stem.conv.weight": conv(
            bb["stem_conv"]["kernel"]
        ),
        "pretrained.model.patch_embed.backbone.stem.norm.weight": bb["stem_gn"]["scale"],
        "pretrained.model.patch_embed.backbone.stem.norm.bias": bb["stem_gn"]["bias"],
        "pretrained.model.patch_embed.proj.weight": conv(
            bb["patch_embed_proj"]["kernel"]
        ),
        "pretrained.model.patch_embed.proj.bias": bb["patch_embed_proj"]["bias"],
        "pretrained.model.cls_token": bb["cls_token"],
        "pretrained.model.pos_embed": bb["pos_embed"],
    }
    norm_map = {"gn1": "norm1", "gn2": "norm2", "gn3": "norm3"}
    for s_i in range(3):
        blk = bb[f"stage{s_i}_block0"]
        p = f"pretrained.model.patch_embed.backbone.stages.{s_i}.blocks.0."
        for c in ("conv1", "conv2", "conv3"):
            sd[p + f"{c}.weight"] = conv(blk[c]["kernel"])
        for ours, theirs in norm_map.items():
            sd[p + f"{theirs}.weight"] = blk[ours]["scale"]
            sd[p + f"{theirs}.bias"] = blk[ours]["bias"]
        if "downsample_conv" in blk:
            sd[p + "downsample.conv.weight"] = conv(
                blk["downsample_conv"]["kernel"]
            )
            sd[p + "downsample.norm.weight"] = blk["downsample_gn"]["scale"]
            sd[p + "downsample.norm.bias"] = blk["downsample_gn"]["bias"]
    for i in range(2):
        blk = bb[f"block{i}"]
        p = f"pretrained.model.blocks.{i}."
        sd[p + "attn.qkv.weight"] = dense(blk["qkv"]["kernel"])
        sd[p + "attn.qkv.bias"] = blk["qkv"]["bias"]
        sd[p + "attn.proj.weight"] = dense(blk["proj"]["kernel"])
        sd[p + "attn.proj.bias"] = blk["proj"]["bias"]
        sd[p + "norm1.weight"] = blk["norm1"]["scale"]
        sd[p + "norm1.bias"] = blk["norm1"]["bias"]
        sd[p + "norm2.weight"] = blk["norm2"]["scale"]
        sd[p + "norm2.bias"] = blk["norm2"]["bias"]
        sd[p + "mlp.fc1.weight"] = dense(blk["mlp_fc1"]["kernel"])
        sd[p + "mlp.fc1.bias"] = blk["mlp_fc1"]["bias"]
        sd[p + "mlp.fc2.weight"] = dense(blk["mlp_fc2"]["kernel"])
        sd[p + "mlp.fc2.bias"] = blk["mlp_fc2"]["bias"]
    for lvl in (3, 4):
        ro = bb[f"readout{lvl}"]["project"]
        sd[f"pretrained.act_postprocess{lvl}.0.project.0.weight"] = dense(ro["kernel"])
        sd[f"pretrained.act_postprocess{lvl}.0.project.0.bias"] = ro["bias"]
        pr = bb[f"proj{lvl}"]
        sd[f"pretrained.act_postprocess{lvl}.3.weight"] = conv(pr["kernel"])
        sd[f"pretrained.act_postprocess{lvl}.3.bias"] = pr["bias"]
    sd["pretrained.act_postprocess4.4.weight"] = conv(bb["down2x"]["kernel"])
    sd["pretrained.act_postprocess4.4.bias"] = bb["down2x"]["bias"]

    p, s = import_dpt_hybrid_depth_model(
        {k: np.asarray(v) for k, v in sd.items()}
    )
    fresh = jax.device_get(model.init(jax.random.PRNGKey(9), x)["params"])
    merged = merge_into(fresh, p, verbose=False)
    for name in ("stem_conv", "patch_embed_proj", "cls_token"):
        got, want = merged["backbone"][name], bb[name]
        if isinstance(want, dict):
            for k in want:
                np.testing.assert_allclose(got[k], want[k], err_msg=f"{name}.{k}")
        else:
            np.testing.assert_allclose(got, want, err_msg=name)
    np.testing.assert_allclose(
        merged["backbone"]["stage1_block0"]["conv2"]["kernel"],
        bb["stage1_block0"]["conv2"]["kernel"],
    )
    np.testing.assert_allclose(
        merged["backbone"]["block1"]["qkv"]["kernel"],
        bb["block1"]["qkv"]["kernel"],
    )


def test_levit_dpt_import_roundtrip():
    """LeViT DPT importer round-trip (MiDaS dpt_levit_224 layout: timm
    Linear_BN/ConvNorm `c`/`bn` children, fused qkv, subsample kv+q,
    ConvTranspose stem under scratch.stem_transpose)."""
    from functools import partial

    from soccdpt_tpu.core.torch_import import (
        _levit_block_names,
        import_dpt_levit_model,
    )
    from soccdpt_tpu.models.backbones import dpt_extras, make_backbone
    from soccdpt_tpu.models.dpt import DPT
    from soccdpt_tpu.models.heads import DepthHead

    factory, chans = make_backbone("levittest_64")
    model = DPT(
        backbone=factory,
        in_channels=chans,
        head=partial(DepthHead, head_features_1=32, head_features_2=8),
        features=32,
        **dpt_extras("levittest_64"),
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.device_get(model.init(jax.random.PRNGKey(0), x))
    params, stats = v["params"], v["batch_stats"]

    def conv(k):
        return np.transpose(k, (3, 2, 0, 1))

    def conv_t(k):
        # inverse of torch_import._conv_t: flax stores the spatially
        # FLIPPED torch ConvTranspose2d kernel (correlation vs conv
        # gradient), so flip back before the layout transpose
        return np.transpose(np.ascontiguousarray(k[::-1, ::-1]), (2, 3, 0, 1))

    def dense(k):
        return np.transpose(k, (1, 0))

    def bn(sd, prefix, p_tree, s_tree):
        sd[prefix + ".weight"] = p_tree["scale"]
        sd[prefix + ".bias"] = p_tree["bias"]
        sd[prefix + ".running_mean"] = s_tree["mean"]
        sd[prefix + ".running_var"] = s_tree["var"]

    bb, bs = params["backbone"], stats["backbone"]
    sd = {}
    for i in range(4):
        sd[f"pretrained.model.patch_embed.{2 * i}.c.weight"] = conv(
            bb[f"stem{i}"]["conv"]["kernel"]
        )
        bn(
            sd, f"pretrained.model.patch_embed.{2 * i}.bn",
            bb[f"stem{i}"]["bn"], bs[f"stem{i}"]["bn"],
        )
    depths = (2, 2, 2)
    for n, (name, kind) in _levit_block_names(depths).items():
        t = f"pretrained.model.blocks.{n}."
        pb, sb = bb[name], bs[name]
        if kind == "mlp":
            for idx, fc in ((0, "fc1"), (2, "fc2")):
                sd[t + f"m.{idx}.c.weight"] = dense(pb[fc]["linear"]["kernel"])
                bn(sd, t + f"m.{idx}.bn", pb[fc]["bn"], sb[fc]["bn"])
        elif kind == "attn":
            sd[t + "m.qkv.c.weight"] = dense(pb["qkv"]["linear"]["kernel"])
            bn(sd, t + "m.qkv.bn", pb["qkv"]["bn"], sb["qkv"]["bn"])
            sd[t + "m.proj.1.c.weight"] = dense(pb["proj"]["linear"]["kernel"])
            bn(sd, t + "m.proj.1.bn", pb["proj"]["bn"], sb["proj"]["bn"])
            sd[t + "m.attention_biases"] = pb["attn_bias"]
        else:  # sub
            sd[t + "kv.c.weight"] = dense(pb["kv"]["linear"]["kernel"])
            bn(sd, t + "kv.bn", pb["kv"]["bn"], sb["kv"]["bn"])
            sd[t + "q.1.c.weight"] = dense(pb["q"]["linear"]["kernel"])
            bn(sd, t + "q.1.bn", pb["q"]["bn"], sb["q"]["bn"])
            sd[t + "proj.1.c.weight"] = dense(pb["proj"]["linear"]["kernel"])
            bn(sd, t + "proj.1.bn", pb["proj"]["bn"], sb["proj"]["bn"])
            sd[t + "attention_biases"] = pb["attn_bias"]

    st, ss = params["stem_transpose"], stats["stem_transpose"]
    sd["scratch.stem_transpose.0.c.weight"] = conv_t(st["up1"]["kernel"])
    bn(sd, "scratch.stem_transpose.0.bn", st["bn1"], ss["bn1"])
    sd["scratch.stem_transpose.2.c.weight"] = conv_t(st["up2"]["kernel"])
    bn(sd, "scratch.stem_transpose.2.bn", st["bn2"], ss["bn2"])

    for k in range(1, 4):
        sd[f"scratch.layer{k}_rn.weight"] = conv(params[f"layer{k}_rn"]["kernel"])
        rn = params[f"refinenet{k}"]
        for u in (1, 2):
            if f"res_conv_unit{u}" not in rn:
                continue
            for c in (1, 2):
                sd[f"scratch.refinenet{k}.resConfUnit{u}.conv{c}.weight"] = conv(
                    rn[f"res_conv_unit{u}"][f"conv{c}"]["kernel"]
                )
                sd[f"scratch.refinenet{k}.resConfUnit{u}.conv{c}.bias"] = rn[
                    f"res_conv_unit{u}"
                ][f"conv{c}"]["bias"]
        sd[f"scratch.refinenet{k}.out_conv.weight"] = conv(rn["out_conv"]["kernel"])
        sd[f"scratch.refinenet{k}.out_conv.bias"] = rn["out_conv"]["bias"]
    head = params["head"]
    for idx, cname in ((0, "conv1"), (2, "conv2"), (4, "conv3")):
        sd[f"scratch.output_conv.{idx}.weight"] = conv(head[cname]["kernel"])
        sd[f"scratch.output_conv.{idx}.bias"] = head[cname]["bias"]

    p, s = import_dpt_levit_model(
        {k: np.asarray(v) for k, v in sd.items()}, depths=depths
    )
    fresh = jax.device_get(model.init(jax.random.PRNGKey(9), x))
    merged_p = merge_into(fresh["params"], p, verbose=False)
    merged_s = merge_into(fresh["batch_stats"], s, verbose=False)

    got_p = dict(jax.tree_util.tree_leaves_with_path(merged_p))
    for path, want in jax.tree_util.tree_leaves_with_path(params):
        np.testing.assert_allclose(got_p[path], want, err_msg=str(path))
    got_s = dict(jax.tree_util.tree_leaves_with_path(merged_s))
    for path, want in jax.tree_util.tree_leaves_with_path(stats):
        np.testing.assert_allclose(got_s[path], want, err_msg=str(path))


def test_next_vit_dpt_import_roundtrip():
    """Next-ViT DPT importer round-trip (official bytedance layout under
    pretrained.model: stem.{i} / features.{N} with verbatim child
    names). The inverse key map in this test is mechanical because the
    flax module names mirror the torch attribute names."""
    import re
    from functools import partial

    from soccdpt_tpu.core.torch_import import import_dpt_next_vit_model
    from soccdpt_tpu.models.backbones import make_backbone
    from soccdpt_tpu.models.dpt import DPT
    from soccdpt_tpu.models.heads import DepthHead

    factory, chans = make_backbone("nextvittest_64")
    model = DPT(
        backbone=factory,
        in_channels=chans,
        head=partial(DepthHead, head_features_1=32, head_features_2=8),
        features=32,
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.device_get(model.init(jax.random.PRNGKey(0), x))
    params, stats = v["params"], v["batch_stats"]

    def conv(k):
        return np.transpose(k, (3, 2, 0, 1))

    def dense(k):
        return np.transpose(k, (1, 0))

    def walk(node, path, out):
        if isinstance(node, dict):
            for kk, vv in node.items():
                walk(vv, path + (kk,), out)
        else:
            out[path] = node

    flat_p, flat_s = {}, {}
    walk(params["backbone"], (), flat_p)
    walk(stats["backbone"], (), flat_s)

    def torch_prefix(path):
        m = re.match(r"(stem|features)(\d+)$", path[0])
        return ".".join(["pretrained", "model", m.group(1), m.group(2)] + list(path[1:-1]))

    sd = {}
    for path, val in flat_p.items():
        base = torch_prefix(path)
        if path[-1] == "kernel":
            sd[base + ".weight"] = conv(val) if val.ndim == 4 else dense(val)
        elif path[-1] == "scale":
            sd[base + ".weight"] = val
        else:
            sd[base + ".bias"] = val
    for path, val in flat_s.items():
        base = torch_prefix(path)
        sd[base + ".running_mean" if path[-1] == "mean" else base + ".running_var"] = val

    p, s = import_dpt_next_vit_model({k: np.asarray(v) for k, v in sd.items()})
    fresh = jax.device_get(model.init(jax.random.PRNGKey(9), x))
    merged_p = merge_into(fresh["params"], p, verbose=False)["backbone"]
    merged_s = merge_into(fresh["batch_stats"], s, verbose=False)["backbone"]

    got_p, got_s = {}, {}
    walk(merged_p, (), got_p)
    walk(merged_s, (), got_s)
    assert set(got_p) == set(flat_p)
    for path, want in flat_p.items():
        np.testing.assert_allclose(got_p[path], want, err_msg=str(path))
    for path, want in flat_s.items():
        np.testing.assert_allclose(got_s[path], want, err_msg=str(path))
