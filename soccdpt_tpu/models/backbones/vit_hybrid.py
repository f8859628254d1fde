"""ViT-hybrid (ResNet50+ViT-B) backbone for dpt_hybrid_384, flax-native.

Replaces the reference's timm ``vit_base_resnet50_384`` wrapper —
which is *broken* in the reference (an ``exec`` on an undefined
variable, backbones/vit.py:181-182,221-223; SURVEY.md §2.6) — with a
working implementation matching timm's actual hybrid trunk
(``_resnetv2(layers=(3,4,9), preact=False, stem_type='same',
conv_layer=StdConv2dSame(eps=1e-8))``): weight-standardized convs with
TF-SAME (asymmetric) padding, GroupNorm(32), NON-pre-activation v1.5
bottlenecks (conv->GN/ReLU, ReLU after the residual add; HF
``BitBottleneckLayer`` is the same structure). Stage-0/1 outputs are
pyramid levels 1-2 (256 ch @ /4, 512 ch @ /8); a ViT-B over the /16
stage-2 features supplies levels 3-4 via block-8/11 activations
(768 ch @ /16, /32) — reference hook layout vit.py:147-171, channels
blocks.py:110-112. Whole-trunk parity vs HF ``ViTHybridModel`` is
tested in tests/test_backbone_hf_parity.py (this rewrite fixed the
round-3 structure, which wrongly used pre-activation blocks with
symmetric padding).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vit import Readout, TransformerBlock, ViTConfig

Dtype = Any


class WSConv(nn.Conv):
    """Weight-standardized conv (BiT / ResNetV2)."""

    def param(self, name, init_fn, *args):
        p = super().param(name, init_fn, *args)
        if name == "kernel":
            mean = jnp.mean(p, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(p, axis=(0, 1, 2), keepdims=True)
            p = (p - mean) * jax.lax.rsqrt(var + 1e-8)
        return p


def _gn(name: str):
    """GroupNorm(32) in f32 (timm GroupNormAct / HF BitGroupNormActivation,
    eps=1e-5)."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name=name)


class BottleneckV15(nn.Module):
    """timm ResNetV2 ``preact=False`` Bottleneck == HF BitBottleneckLayer:
    conv1->GN/ReLU -> conv2(stride, TF-SAME)->GN/ReLU -> conv3->GN,
    shortcut = GN(conv1x1(x)) on the FIRST block of a stage, ReLU after
    the residual add. Weight-standardized convs throughout (eps=1e-8)."""

    mid: int
    out: int
    stride: int = 1
    is_first: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.is_first:
            shortcut = WSConv(
                self.out, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            shortcut = _gn("downsample_gn")(shortcut).astype(self.dtype)
        else:
            shortcut = x

        h = WSConv(
            self.mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        h = nn.relu(_gn("gn1")(h).astype(self.dtype))
        h = WSConv(
            self.mid, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=self.dtype, name="conv2",
        )(h)
        h = nn.relu(_gn("gn2")(h).astype(self.dtype))
        h = WSConv(
            self.out, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(h)
        h = _gn("gn3")(h).astype(self.dtype)
        return nn.relu(h + shortcut)


@dataclass(frozen=True)
class HybridConfig:
    img_size: int = 384
    stem_width: int = 64
    stage_blocks: Tuple[int, int, int] = (3, 4, 9)
    vit: ViTConfig = ViTConfig(img_size=384, patch_size=16)
    vit_hooks: Tuple[int, int] = (8, 11)
    post_channels: Tuple[int, int, int, int] = (256, 512, 768, 768)


HYBRID_CONFIGS = {
    "vitb_rn50_384": HybridConfig(),
    "hybridtest_64": HybridConfig(
        img_size=64,
        stem_width=32,
        stage_blocks=(1, 1, 1),
        vit=ViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2),
        vit_hooks=(0, 1),
        post_channels=(128, 256, 32, 32),
    ),
}


class ViTHybridBackbone(nn.Module):
    cfg: HybridConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        B = x.shape[0]
        w = cfg.stem_width

        # timm 'same' non-preact stem: WS-conv 7x7/2 (TF-SAME) -> GN/ReLU
        # -> 3x3/2 max-pool (TF-SAME). Post-ReLU values are >= 0, so the
        # SAME max-pool's -inf identity padding matches HF's zero-padded
        # BitMaxPool2d exactly.
        h = WSConv(
            w, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        h = nn.relu(_gn("stem_gn")(h).astype(self.dtype))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")

        feats = []
        chans = (w * 4, w * 8, w * 16)
        for s, depth in enumerate(cfg.stage_blocks):
            for b in range(depth):
                h = BottleneckV15(
                    mid=chans[s] // 4,
                    out=chans[s],
                    stride=2 if (s > 0 and b == 0) else 1,
                    is_first=(b == 0),
                    dtype=self.dtype,
                    name=f"stage{s}_block{b}",
                )(h)
            if s < 2:
                feats.append(h)  # 256 @ /4, 512 @ /8

        # ViT over /16 features
        vit = cfg.vit
        C = vit.embed_dim
        gh, gw = h.shape[1], h.shape[2]
        tokens = nn.Conv(
            C, (1, 1), dtype=self.dtype, name="patch_embed_proj"
        )(h).reshape(B, gh * gw, C)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, C))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (B, 1, C)), tokens], axis=1
        )
        g0 = vit.img_size // 16
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, 1 + g0 * g0, C)
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (g0, g0):
            from ...ops.resize import resize_hw

            patch_pos = resize_hw(
                patch_pos.reshape(1, g0, g0, C), (gh, gw), "bilinear", False
            ).reshape(1, gh * gw, C)
        tokens = tokens + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(
            tokens.dtype
        )

        vit_feats = []
        for i in range(vit.depth):
            tokens = TransformerBlock(
                cfg=vit, grid=(gh, gw), dtype=self.dtype, name=f"block{i}"
            )(tokens, deterministic=deterministic)
            if i in cfg.vit_hooks:
                vit_feats.append(tokens)

        for lvl, tok in enumerate(vit_feats):
            t = Readout(
                mode=vit.readout, dim=C, dtype=self.dtype,
                name=f"readout{lvl + 3}",
            )(tok)
            t = t.reshape(B, gh, gw, C)
            ch = cfg.post_channels[2 + lvl]
            t = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"proj{lvl + 3}")(t)
            if lvl == 1:
                t = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="down2x",
                )(t)
            feats.append(t)
        return tuple(feats)


def make_vit_hybrid_backbone(
    backbone: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Dtype = jnp.float32,
):
    cfg = HYBRID_CONFIGS[backbone]
    if hooks is not None and len(hooks) == 4:
        cfg = HybridConfig(
            img_size=cfg.img_size,
            stem_width=cfg.stem_width,
            stage_blocks=cfg.stage_blocks,
            vit=cfg.vit,
            vit_hooks=(hooks[2], hooks[3]),
            post_channels=cfg.post_channels,
        )
    factory = functools.partial(ViTHybridBackbone, cfg=cfg, dtype=dtype)
    return factory, cfg.post_channels
