"""WHOLE-MODEL composition parity: the composed SOccDPT forward vs a
stitched torch/numpy oracle under ONE weight set, through the
production importer (``core.torch_import.import_soccdpt_v{1,2,3}``).

Every piece is oracle-tested elsewhere (trunk vs HF in
test_backbone_hf_parity, decoder/heads vs the reference's own torch
modules in test_torch_parity, geometry vs numpy in test_geometry) —
this file tests the COMPOSITION: image -> trunk -> scratch -> fusion ->
both heads -> resize -> unproject -> voxelize, end to end, because
composition seams are where round 3's four real bugs lived.

The oracle stack shares no forward code with this repo:

* trunk: HuggingFace ``Swinv2Model`` (independent implementation,
  proven per-trunk equivalent in test_backbone_hf_parity);
* decoder + heads: the reference's OWN torch modules
  (``/root/reference/SOccDPT/model/dpt.py:142-232``,
  ``blocks.py:348-497``, V3 seg head ``SOccDPT.py:660-674``), executed
  in torch exactly as ``DPT.forward`` wires them;
* geometry: numpy transcription of ``SOccDPT.get_semantic_occupancy``
  (``SOccDPT.py:264-463``) with the two documented SURVEY §2.6 fixes
  (per-coordinate pc_scale/pc_shift instead of the first-3-points
  axis pun; per-batch accumulating voxel scatter instead of the
  batch-collapsed ``+=``) — the semantics this repo implements.

Weight flow: ONE reference-layout torch state dict (timm trunk keys
synthesized from the HF model + the reference modules' own
``state_dict()``) is pushed through ``import_soccdpt_v3`` into the flax
model — the production path real checkpoints will take — while the
torch oracle executes the originals. Every imported leaf is asserted to
differ from its fresh init (a dropped key would otherwise silently
leave both stacks agreeing on the wrong weights).

Tolerance ladder (f32 end to end, documented per output):
* inv_depth / seg (camera res):   atol 1e-4  (accumulated trunk float
  error; same bound as the whole-trunk HF tests)
* points:                         atol 5e-3 m (depth = 1/inv amplifies
  inv error by depth^2 ~ 30x; inv is biased >= ~0.2 by construction so
  the amplification is bounded)
* occupancy grid: two-sided —
  (a) flax grid vs numpy-voxelized FLAX points: atol 1e-3 (isolates
      voxelizer wiring inside the composed graph; exact math);
  (b) flax grid vs the full oracle grid: mismatched cell mass < 1% of
      total (points within float error of a voxel boundary may
      legitimately land one cell apart between the two stacks).
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

pytestmark = pytest.mark.slow

from test_torch_parity import (  # noqa: E402
    _install_timm_stub,
    _t2n,
)

from soccdpt_tpu.core.config import (  # noqa: E402
    CameraConfig,
    ModelConfig,
    OccupancyConfig,
)
from soccdpt_tpu.core.torch_import import (  # noqa: E402
    import_soccdpt,
    merge_into,
)
from soccdpt_tpu.models.soccdpt import build_model  # noqa: E402

RTOL = 1e-4


def _randomize_bn(module, seed):
    """Randomize BatchNorm running stats AND affine params: torch's
    (1, 0) affine defaults equal the flax init, which would trip the
    every-leaf-changed import check below as a false positive."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.3
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
                m.weight.copy_(
                    torch.rand(m.weight.shape, generator=g) + 0.5
                )
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


@pytest.fixture(scope="module")
def ref():
    import types

    _install_timm_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import SOccDPT.model.blocks as blocks
    import SOccDPT.model.dpt as dpt
    from SOccDPT.model.scaled_tanh import ScaledTanh

    return types.SimpleNamespace(blocks=blocks, dpt=dpt, ScaledTanh=ScaledTanh)


# ---------------------------------------------------------------------------
# HF Swinv2 trunk -> timm-layout state dict (the layout reference
# checkpoints store and the importer consumes; pure key/cat mapping)
# ---------------------------------------------------------------------------


def _hf_trunk(name, img_size):
    from transformers.models.swinv2.configuration_swinv2 import Swinv2Config
    from transformers.models.swinv2.modeling_swinv2 import Swinv2Model

    from soccdpt_tpu.models.backbones.swin2 import SWIN2_CONFIGS

    cfg = SWIN2_CONFIGS[name]
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
    # Randomize at small scale: HF's default init leaves layernorms at
    # (1, 0) and many biases at 0, which would mask dropped-key imports.
    g = torch.Generator().manual_seed(hash(name) % 2**31)
    with torch.no_grad():
        for p in hf.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    hf.eval()
    return hf, cfg


def _timm_sd_from_hf(hf):
    """HF Swinv2Model weights -> the timm SwinTransformerV2 key layout
    (reference checkpoints: ``pretrained.model.*``)."""
    sd = {}
    emb = hf.embeddings
    sd["patch_embed.proj.weight"] = _t2n(emb.patch_embeddings.projection.weight)
    sd["patch_embed.proj.bias"] = _t2n(emb.patch_embeddings.projection.bias)
    sd["patch_embed.norm.weight"] = _t2n(emb.norm.weight)
    sd["patch_embed.norm.bias"] = _t2n(emb.norm.bias)
    for i, stage in enumerate(hf.encoder.layers):
        for j, blk in enumerate(stage.blocks):
            a = blk.attention.self
            pre = f"layers.{i}.blocks.{j}."
            sd[pre + "attn.qkv.weight"] = np.concatenate(
                [_t2n(a.query.weight), _t2n(a.key.weight), _t2n(a.value.weight)]
            )
            sd[pre + "attn.q_bias"] = _t2n(a.query.bias)
            sd[pre + "attn.v_bias"] = _t2n(a.value.bias)
            sd[pre + "attn.logit_scale"] = _t2n(a.logit_scale)
            mlp = a.continuous_position_bias_mlp
            sd[pre + "attn.cpb_mlp.0.weight"] = _t2n(mlp[0].weight)
            sd[pre + "attn.cpb_mlp.0.bias"] = _t2n(mlp[0].bias)
            sd[pre + "attn.cpb_mlp.2.weight"] = _t2n(mlp[2].weight)
            sd[pre + "attn.proj.weight"] = _t2n(blk.attention.output.dense.weight)
            sd[pre + "attn.proj.bias"] = _t2n(blk.attention.output.dense.bias)
            sd[pre + "norm1.weight"] = _t2n(blk.layernorm_before.weight)
            sd[pre + "norm1.bias"] = _t2n(blk.layernorm_before.bias)
            sd[pre + "norm2.weight"] = _t2n(blk.layernorm_after.weight)
            sd[pre + "norm2.bias"] = _t2n(blk.layernorm_after.bias)
            sd[pre + "mlp.fc1.weight"] = _t2n(blk.intermediate.dense.weight)
            sd[pre + "mlp.fc1.bias"] = _t2n(blk.intermediate.dense.bias)
            sd[pre + "mlp.fc2.weight"] = _t2n(blk.output.dense.weight)
            sd[pre + "mlp.fc2.bias"] = _t2n(blk.output.dense.bias)
        if stage.downsample is not None:
            pre = f"layers.{i}.downsample."
            sd[pre + "reduction.weight"] = _t2n(stage.downsample.reduction.weight)
            sd[pre + "norm.weight"] = _t2n(stage.downsample.norm.weight)
            sd[pre + "norm.bias"] = _t2n(stage.downsample.norm.bias)
    return sd


def _hf_stage_feats(hf, pixel, grid):
    """Stage features exactly as the reference taps timm (last block of
    every stage == HF's before-downsampling hidden states), NCHW."""
    with torch.no_grad():
        embq, dims = hf.embeddings(pixel)
        out = hf.encoder(
            embq,
            dims,
            output_hidden_states=True,
            output_hidden_states_before_downsampling=True,
            return_dict=True,
        )
    feats = []
    for i, hs in enumerate(out.hidden_states[1:5]):
        g = (grid[0] >> i, grid[1] >> i)
        f = _t2n(hs).reshape(hs.shape[0], g[0], g[1], hs.shape[-1])
        feats.append(torch.tensor(np.transpose(f, (0, 3, 1, 2))))
    return feats


# ---------------------------------------------------------------------------
# Reference torch decoder/heads (the reference's own modules)
# ---------------------------------------------------------------------------


class _RefDPT(tnn.Module):
    """The reference's decoder stack under the checkpoint's key layout,
    forward wired exactly as reference dpt.py:142-182."""

    def __init__(self, ref, in_channels, features, head, use_bn=False):
        super().__init__()
        scratch = tnn.Module()
        for i, c in enumerate(in_channels):
            setattr(
                scratch,
                f"layer{i + 1}_rn",
                tnn.Conv2d(c, features, 3, padding=1, bias=False),
            )
        for k in range(1, 5):
            setattr(
                scratch,
                f"refinenet{k}",
                ref.dpt._make_fusion_block(features, use_bn),
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


def _depth_head_torch(ref, hf1, hf2, bias_shift=0.3):
    """Reference depth head (dpt.py:199-219). conv3's weights are scaled
    down and its bias shifted positive so inv_depth stays in a benign
    ~(0.2, 0.5) band: depth = 1/inv amplifies float error by depth^2 and
    relu-zero pixels would compare 0 vs the reference's in-place 1e-8
    clamp."""
    head = tnn.Sequential(
        tnn.Conv2d(hf1, hf1 // 2, kernel_size=3, stride=1, padding=1),
        ref.blocks.Interpolate(scale_factor=2, mode="bilinear", align_corners=True),
        tnn.Conv2d(hf1 // 2, hf2, kernel_size=3, stride=1, padding=1),
        tnn.ReLU(True),
        tnn.Conv2d(hf2, 1, kernel_size=1, stride=1, padding=0),
        tnn.ReLU(True),
        tnn.Identity(),
    )
    with torch.no_grad():
        head[4].weight.mul_(0.1)
        head[4].bias.fill_(bias_shift)
    return head


def _seg_head_torch(ref, features, num_classes, sigmoid=True):
    """Reference V2/V3 seg head (SOccDPT.py:660-674)."""
    act = tnn.Sigmoid() if sigmoid else ref.ScaledTanh()
    head = tnn.Sequential(
        tnn.Conv2d(features, features, kernel_size=3, padding=1, bias=False),
        tnn.BatchNorm2d(features),
        tnn.ReLU(True),
        tnn.Dropout(0.1, False),
        tnn.Conv2d(features, num_classes, kernel_size=1),
        ref.blocks.Interpolate(scale_factor=2, mode="bilinear", align_corners=True),
        act,
    )
    with torch.no_grad():
        _randomize_bn(head, seed=23)
    return head


def _seg_output_conv_torch(ref, features, num_classes):
    """Reference DPTSegmentationModel head (dpt.py:242-252)."""
    head = tnn.Sequential(
        tnn.Conv2d(features, features, kernel_size=3, padding=1, bias=False),
        tnn.BatchNorm2d(features),
        tnn.ReLU(True),
        tnn.Dropout(0.1, False),
        tnn.Conv2d(features, num_classes, kernel_size=1),
        ref.blocks.Interpolate(scale_factor=2, mode="bilinear", align_corners=True),
        tnn.Sigmoid(),
    )
    with torch.no_grad():
        _randomize_bn(head, seed=29)
    return head


# ---------------------------------------------------------------------------
# Numpy geometry oracle (reference SOccDPT.py:264-463 + SURVEY §2.6 fixes)
# ---------------------------------------------------------------------------


def _rot_matrix(angles_deg):
    """R = Ra @ Rb @ Rc, applied as points @ R — the reference's
    model-path convention (SOccDPT.py:114-128, einsum 'bnm,mj')."""
    import math

    a, b, c = (math.radians(v) for v in angles_deg)
    ra = np.array(
        [[1, 0, 0], [0, math.cos(a), -math.sin(a)], [0, math.sin(a), math.cos(a)]]
    )
    rb = np.array(
        [[math.cos(b), 0, math.sin(b)], [0, 1, 0], [-math.sin(b), 0, math.cos(b)]]
    )
    rc = np.array(
        [[math.cos(c), -math.sin(c), 0], [math.sin(c), math.cos(c), 0], [0, 0, 1]]
    )
    return (ra @ rb @ rc).astype(np.float32)


def _oracle_geometry(inv_depth_t, seg_t, camera, occ, num_classes, out_hw):
    """(torch inv_depth (B,h,w), torch seg (B,C,h,w)) -> numpy
    (inv_up, seg_up, points, grid) per the reference's
    get_semantic_occupancy with the §2.6 fixes; resizes in torch
    (the reference's own F.interpolate), everything after in numpy."""
    H, W = out_hw
    with torch.no_grad():
        inv_up = F.interpolate(
            inv_depth_t.unsqueeze(1), size=(H, W), mode="bicubic",
            align_corners=False,
        ).squeeze(1)
        seg_up = F.interpolate(seg_t, size=(H, W), mode="nearest")
    inv_up = _t2n(inv_up)
    seg_up = _t2n(seg_up)

    depth = 1.0 / np.maximum(inv_up, 1e-8)

    # reduced output size: intrinsics scale with the resolution (this
    # repo's documented extension — geometry.py get_semantic_occupancy)
    sy, sx = H / camera.height, W / camera.width
    fx, fy = camera.fx * sx, camera.fy * sy
    cx, cy = camera.cx * sx, camera.cy * sy

    U = np.arange(H, dtype=np.float32)[:, None]
    V = np.arange(W, dtype=np.float32)[None, :]
    X = (V - cx) * depth / fx
    Y = (U - cy) * depth / fy
    points = np.stack([X, Y, depth], axis=-1)  # (B, H, W, 3)

    # voxelization input: per-coordinate scale/shift (§2.6 fix of the
    # reference's points_3D[:, 0..2] axis pun), then rotate
    pts = points.reshape(points.shape[0], -1, 3).copy()
    pts = pts * np.asarray(occ.pc_scale, np.float32) + np.asarray(
        occ.pc_shift, np.float32
    )
    pts = pts @ _rot_matrix(occ.correction_angle)
    sem = seg_up.reshape(seg_up.shape[0], num_classes, -1).transpose(0, 2, 1)
    grid = _oracle_voxelize(pts, sem, occ, num_classes)
    return inv_up, seg_up, points, grid


def _oracle_voxelize(pts, sem, occ, num_classes):
    """Reference points_to_occupancy_grid (SOccDPT.py:374-455) with the
    §2.6 fixes: per-batch pairing + true accumulation (np.add.at), and
    probability mass (this repo's mode="prob") instead of the
    reference's nonzero-of-probabilities unit increments."""
    B = pts.shape[0]
    gx, gy, gz = occ.grid_size
    shape_m = np.asarray(occ.occupancy_shape, np.float32)
    gsize = np.asarray(occ.grid_size, np.float32)
    grid = np.zeros((B, gx, gy, gz, num_classes), np.float32)
    for b in range(B):
        p, s = pts[b], sem[b]
        finite = np.isfinite(p).all(axis=-1)
        p, s = p[finite], s[finite]
        ijk = (p / shape_m * gsize).astype(np.int64)
        inb = ((ijk > 0) & (ijk < np.asarray(occ.grid_size))).all(axis=-1)
        ijk, s = ijk[inb], s[inb]
        np.add.at(grid[b], (ijk[:, 0], ijk[:, 1], ijk[:, 2]), s)
    return grid


# ---------------------------------------------------------------------------
# Import helpers
# ---------------------------------------------------------------------------


def _import_checked(model, x, sd, version, init_kw=None):
    """sd -> production importer -> lenient merge; assert EVERY imported
    leaf changed from its fresh init (catches silently dropped keys)."""
    variables = jax.device_get(
        model.init(jax.random.PRNGKey(0), x, **(init_kw or {}))
    )
    p, s = import_soccdpt(sd, version=version)
    merged_p = merge_into(variables["params"], p, verbose=False)
    out = {"params": merged_p}
    if "batch_stats" in variables:
        out["batch_stats"] = merge_into(variables["batch_stats"], s, verbose=False)

    flat_init = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_new = dict(jax.tree_util.tree_leaves_with_path(merged_p))
    unchanged = [
        jax.tree_util.keystr(path)
        for path, leaf in flat_init
        if np.array_equal(np.asarray(leaf), np.asarray(flat_new[path]))
    ]
    assert not unchanged, f"leaves not covered by the import: {unchanged}"
    return out


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# V3 — the flagship, full contract including geometry + occupancy
# ---------------------------------------------------------------------------


def test_v3_whole_model_composition_vs_stitched_oracle(ref):
    """Composed V3 at the REAL flagship type (dpt_swin2_tiny_256,
    256x256, features 256) vs HF trunk + reference decoder + numpy
    geometry, outputs at a reduced 90x160 camera resolution."""
    B, S = 2, 256
    out_hw = (90, 160)
    occ_cfg = OccupancyConfig(
        grid_size=(32, 32, 32),
        scale=(1.0, 1.0, 1.0),
        pc_scale=(4.0, 4.0, 4.0),
        pc_shift=(16.0, 16.0, 8.0),
        correction_angle=(7.0, 0.0, 0.0),
    )
    cfg = ModelConfig(
        model_type="dpt_swin2_tiny_256",
        version=3,
        compute_occ=True,
        occupancy=occ_cfg,
    )

    hf, bb_cfg = _hf_trunk("swin2t16_256", S)
    in_channels = tuple(
        bb_cfg.embed_dim * (2**i) for i in range(len(bb_cfg.depths))
    )
    torch.manual_seed(31)
    tdec = _RefDPT(
        ref, in_channels, cfg.features,
        _depth_head_torch(ref, cfg.features, cfg.head_features_2),
    )
    tdec.eval()
    tseg = _seg_head_torch(ref, cfg.features, cfg.num_classes)
    tseg.eval()

    sd = {f"depth_net.pretrained.model.{k}": v
          for k, v in _timm_sd_from_hf(hf).items()}
    sd.update(
        {f"depth_net.{k}": _t2n(v) for k, v in tdec.state_dict().items()}
    )
    sd.update({f"seg_head.{k}": _t2n(v) for k, v in tseg.state_dict().items()})

    model = build_model(cfg)
    rng = np.random.default_rng(37)
    x = rng.standard_normal((B, 3, S, S)).astype(np.float32)
    variables = _import_checked(
        model, jnp.asarray(x[:1]), sd, version=3,
        init_kw=dict(deterministic=True, return_raw=True),
    )

    inv_d, seg_up, points, grid = jax.device_get(
        model.apply(
            variables, jnp.asarray(x), deterministic=True,
            compute_occ=True, output_size=out_hw,
        )
    )

    # ---- torch oracle ----
    pixel = torch.tensor(np.transpose(x, (0, 2, 3, 1)).transpose(0, 3, 1, 2))
    feats = _hf_stage_feats(hf, pixel, (S // bb_cfg.patch_size,) * 2)
    with torch.no_grad():
        t_inv_raw, t_path = tdec(*feats)
        t_seg_raw = tseg(t_path)
    o_inv, o_seg, o_points, o_grid = _oracle_geometry(
        t_inv_raw.squeeze(1), t_seg_raw, cfg.camera, occ_cfg,
        cfg.num_classes, out_hw,
    )

    np.testing.assert_allclose(
        np.asarray(inv_d), o_inv, rtol=RTOL, atol=1e-4, err_msg="inv_depth"
    )
    np.testing.assert_allclose(
        np.asarray(seg_up), o_seg, rtol=RTOL, atol=1e-4, err_msg="seg"
    )
    np.testing.assert_allclose(
        np.asarray(points), o_points, rtol=1e-3, atol=5e-3, err_msg="points"
    )

    # grid ladder (a): exact voxelizer wiring — numpy-voxelize the FLAX
    # points (same §2.6-fixed semantics) and demand near-exact agreement
    pts_flax = np.asarray(points).reshape(B, -1, 3)
    pts_flax = pts_flax * np.asarray(occ_cfg.pc_scale, np.float32) + np.asarray(
        occ_cfg.pc_shift, np.float32
    )
    pts_flax = pts_flax @ _rot_matrix(occ_cfg.correction_angle)
    sem_flax = (
        np.asarray(seg_up).reshape(B, cfg.num_classes, -1).transpose(0, 2, 1)
    )
    grid_from_flax_pts = _oracle_voxelize(
        pts_flax, sem_flax, occ_cfg, cfg.num_classes
    )
    np.testing.assert_allclose(
        np.asarray(grid), grid_from_flax_pts, atol=1e-3,
        err_msg="grid (voxelizer wiring, flax points)",
    )

    # grid ladder (b): full cross-stack grid — voxel-boundary straddling
    # points may land one cell apart; bound the disagreement mass
    total = o_grid.sum()
    assert total > 50.0, f"degenerate fixture: only {total} grid mass"
    mism = np.abs(np.asarray(grid) - o_grid).sum()
    assert mism / total < 0.01, (
        f"grid mass mismatch {mism:.3f} / {total:.1f} exceeds 1%"
    )

    # non-vacuousness: a healthy fraction of points must voxelize
    occupied = (o_grid.sum(-1) > 0).mean()
    assert occupied > 0.005, f"only {occupied:.2%} of cells occupied"


# ---------------------------------------------------------------------------
# V1 / V2 — cheap variants (tiny trunk), raw-head composition
# ---------------------------------------------------------------------------


def _tiny_cfg(version):
    camera = CameraConfig(fx=64.0, fy=64.0, cx=32.0, cy=24.0, width=64, height=48)
    return ModelConfig(
        model_type="dpt_swin2_test_64",
        version=version,
        features=64,
        head_features_2=16,
        camera=camera,
    )


def test_v1_composition_vs_stitched_oracle(ref):
    """V1: two full DPTs (depth + seg with use_bn=True refinenets,
    reference SOccDPT.py:470-523) composed end to end."""
    B, S = 2, 64
    cfg = _tiny_cfg(1)

    hf_d, bb_cfg = _hf_trunk("swin2test_64", S)
    from transformers.models.swinv2.modeling_swinv2 import Swinv2Model

    hf_s = Swinv2Model(hf_d.config, add_pooling_layer=False)
    g = torch.Generator().manual_seed(41)
    with torch.no_grad():
        for p in hf_s.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    hf_s.eval()

    in_channels = tuple(
        bb_cfg.embed_dim * (2**i) for i in range(len(bb_cfg.depths))
    )
    torch.manual_seed(43)
    tdec_d = _RefDPT(
        ref, in_channels, cfg.features,
        _depth_head_torch(ref, cfg.features, cfg.head_features_2),
    )
    tdec_d.eval()
    # V1's seg net is DPTSegmentationModel: use_bn=True fusion decoder +
    # the scratch.output_conv seg head (reference dpt.py:235-252)
    tdec_s = _RefDPT(
        ref, in_channels, cfg.features,
        _seg_output_conv_torch(ref, cfg.features, cfg.num_classes),
        use_bn=True,
    )
    with torch.no_grad():
        _randomize_bn(tdec_s, seed=47)
    tdec_s.eval()

    sd = {f"depth_net.pretrained.model.{k}": v
          for k, v in _timm_sd_from_hf(hf_d).items()}
    sd.update({f"depth_net.{k}": _t2n(v) for k, v in tdec_d.state_dict().items()})
    sd.update({f"seg_net.pretrained.model.{k}": v
               for k, v in _timm_sd_from_hf(hf_s).items()})
    sd.update({f"seg_net.{k}": _t2n(v) for k, v in tdec_s.state_dict().items()})

    model = build_model(cfg)
    rng = np.random.default_rng(53)
    x = rng.standard_normal((B, 3, S, S)).astype(np.float32)
    variables = _import_checked(
        model, jnp.asarray(x[:1]), sd, version=1,
        init_kw=dict(deterministic=True, return_raw=True),
    )
    inv_d, seg = jax.device_get(
        model.apply(
            variables, jnp.asarray(x), deterministic=True, return_raw=True
        )
    )

    pixel = torch.tensor(x)
    grid = (S // bb_cfg.patch_size,) * 2
    with torch.no_grad():
        t_inv, _ = tdec_d(*_hf_stage_feats(hf_d, pixel, grid))
        t_seg, _ = tdec_s(*_hf_stage_feats(hf_s, pixel, grid))
    np.testing.assert_allclose(
        np.asarray(inv_d), _t2n(t_inv.squeeze(1)), rtol=RTOL, atol=1e-4,
        err_msg="V1 inv_depth",
    )
    np.testing.assert_allclose(
        np.asarray(seg), _t2n(t_seg), rtol=RTOL, atol=1e-4, err_msg="V1 seg"
    )


def test_v2_composition_vs_stitched_oracle(ref):
    """V2: one shared identity-head DPT trunk + depth_head/seg_head
    Sequentials on its fused features (reference SOccDPT.py:526-623,
    seg_ead typo accepted by the importer)."""
    B, S = 2, 64
    cfg = _tiny_cfg(2)

    hf, bb_cfg = _hf_trunk("swin2test_64", S)
    in_channels = tuple(
        bb_cfg.embed_dim * (2**i) for i in range(len(bb_cfg.depths))
    )
    torch.manual_seed(59)
    tdec = _RefDPT(ref, in_channels, cfg.features, tnn.Identity())
    tdec.eval()
    t_depth_head = _depth_head_torch(ref, cfg.features, cfg.head_features_2)
    t_seg_head = _seg_head_torch(ref, cfg.features, cfg.num_classes)
    t_depth_head.eval(), t_seg_head.eval()

    sd = {f"pretrained.pretrained.model.{k}": v
          for k, v in _timm_sd_from_hf(hf).items()}
    sd.update({f"pretrained.{k}": _t2n(v) for k, v in tdec.state_dict().items()})
    sd.update(
        {f"depth_head.{k}": _t2n(v) for k, v in t_depth_head.state_dict().items()}
    )
    # exercise the reference's seg_ead typo path (SOccDPT.py:596)
    sd.update(
        {f"seg_ead.{k}": _t2n(v) for k, v in t_seg_head.state_dict().items()}
    )

    model = build_model(cfg)
    rng = np.random.default_rng(61)
    x = rng.standard_normal((B, 3, S, S)).astype(np.float32)
    variables = _import_checked(
        model, jnp.asarray(x[:1]), sd, version=2,
        init_kw=dict(deterministic=True, return_raw=True),
    )
    inv_d, seg = jax.device_get(
        model.apply(
            variables, jnp.asarray(x), deterministic=True, return_raw=True
        )
    )

    pixel = torch.tensor(x)
    grid = (S // bb_cfg.patch_size,) * 2
    with torch.no_grad():
        feats, _ = tdec(*_hf_stage_feats(hf, pixel, grid))
        t_inv = t_depth_head(feats).squeeze(1)
        t_seg = t_seg_head(feats)
    np.testing.assert_allclose(
        np.asarray(inv_d), _t2n(t_inv), rtol=RTOL, atol=1e-4,
        err_msg="V2 inv_depth",
    )
    np.testing.assert_allclose(
        np.asarray(seg), _t2n(t_seg), rtol=RTOL, atol=1e-4, err_msg="V2 seg"
    )
