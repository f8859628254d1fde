"""Next-ViT-Large backbone (dpt_next_vit_large_384), flax-native.

Replaces the reference's timm wrapper with hooks on ``model.features[i]``
(reference backbones/next_vit.py:11-43; hooks [2, 6, 36, 39] =
last block of each stage, dpt.py:79-84; channels [96, 256, 512, 1024],
dpt.py:91-94). Next-ViT interleaves convolutional NCB blocks
(multi-head conv attention: grouped 3x3 conv + BN + projection,
residual, then a ConvFFN) with NTB transformer blocks at stage ends
(efficient global MHSA on spatially-reduced tokens fused with a local
MHCA branch). Stage depths for the Large variant: (3, 4, 30, 3) over a
flat ``features`` list, strides 4/8/16/32.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclass(frozen=True)
class NextViTConfig:
    stem_chs: Tuple[int, int, int] = (64, 32, 64)
    stage_chs: Tuple[int, int, int, int] = (96, 256, 512, 1024)
    depths: Tuple[int, int, int, int] = (3, 4, 30, 3)
    num_heads: int = 32  # head dim for MHSA
    sr_ratios: Tuple[int, int, int, int] = (8, 4, 2, 1)  # MHSA reduction


NEXT_VIT_CONFIGS = {
    "next_vit_large_6m": NextViTConfig(),
    "nextvittest_64": NextViTConfig(
        stem_chs=(16, 8, 16),
        stage_chs=(16, 32, 64, 128),
        depths=(1, 1, 2, 1),
        num_heads=8,
        sr_ratios=(4, 2, 1, 1),
    ),
}

NEXT_VIT_HOOKS = {
    "next_vit_large_6m": (2, 6, 36, 39),
    "nextvittest_64": (0, 1, 3, 4),
}


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="bn",
        )(x).astype(self.dtype)
        return nn.relu(x) if self.relu else x


class MHCA(nn.Module):
    """Multi-head conv attention: grouped 3x3 conv mixing within head
    groups + 1x1 projection."""

    features: int
    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        groups = max(self.features // self.head_dim, 1)
        h = ConvBNReLU(
            self.features, 3, 1, groups=groups, dtype=self.dtype, name="group_conv"
        )(x, deterministic)
        return ConvBNReLU(
            self.features, 1, relu=False, dtype=self.dtype, name="proj"
        )(h, deterministic)


class ConvFFN(nn.Module):
    features: int
    ratio: float = 3.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = int(self.features * self.ratio)
        h = ConvBNReLU(hidden, 1, dtype=self.dtype, name="fc1")(x, deterministic)
        return ConvBNReLU(
            self.features, 1, relu=False, dtype=self.dtype, name="fc2"
        )(h, deterministic)


class NCB(nn.Module):
    """Next Convolution Block: MHCA + ConvFFN, each residual."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.stride > 1 or x.shape[-1] != self.features:
            x = ConvBNReLU(
                self.features, 3, self.stride, relu=False, dtype=self.dtype,
                name="patch_embed",
            )(x, deterministic)
        x = x + MHCA(self.features, dtype=self.dtype, name="mhca")(
            x, deterministic
        )
        return x + ConvFFN(self.features, dtype=self.dtype, name="ffn")(
            x, deterministic
        )


class EfficientMHSA(nn.Module):
    """Global attention with spatial-reduction keys/values."""

    features: int
    head_dim: int
    sr_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        heads = max(C // self.head_dim, 1)
        hd = C // heads
        q = nn.Dense(C, dtype=self.dtype, name="q")(x).reshape(B, H * W, heads, hd)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.avg_pool(
                x,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
            )
        kh, kw = kv_in.shape[1], kv_in.shape[2]
        kv = nn.Dense(2 * C, dtype=self.dtype, name="kv")(kv_in).reshape(
            B, kh * kw, 2, heads, hd
        )
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.reshape(B, H, W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class NTB(nn.Module):
    """Next Transformer Block: MHSA branch + MHCA branch, channel
    concat (shrink-ratio 0.75/0.25), then ConvFFN."""

    features: int
    head_dim: int
    sr_ratio: int
    stride: int = 1
    shrink: float = 0.75
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c_mhsa = int(self.features * self.shrink)
        c_mhca = self.features - c_mhsa
        x = ConvBNReLU(
            c_mhsa, 3, self.stride, relu=False, dtype=self.dtype,
            name="patch_embed",
        )(x, deterministic)
        x = x + EfficientMHSA(
            c_mhsa, self.head_dim, self.sr_ratio, dtype=self.dtype, name="mhsa"
        )(
            nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9,
                dtype=jnp.float32, name="norm",
            )(x).astype(self.dtype),
            deterministic,
        )
        y = ConvBNReLU(
            c_mhca, 1, relu=False, dtype=self.dtype, name="mhca_proj"
        )(x, deterministic)
        y = y + MHCA(c_mhca, self.head_dim, dtype=self.dtype, name="mhca")(
            y, deterministic
        )
        z = jnp.concatenate([x, y], axis=-1)
        return z + ConvFFN(self.features, dtype=self.dtype, name="ffn")(
            z, deterministic
        )


class NextViTBackbone(nn.Module):
    cfg: NextViTConfig
    hooks: Tuple[int, int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        # stem: /4 (three convs, strides 2,1,2)
        x = ConvBNReLU(cfg.stem_chs[0], 3, 2, dtype=self.dtype, name="stem0")(
            x, deterministic
        )
        x = ConvBNReLU(cfg.stem_chs[1], 3, 1, dtype=self.dtype, name="stem1")(
            x, deterministic
        )
        x = ConvBNReLU(cfg.stem_chs[2], 3, 2, dtype=self.dtype, name="stem2")(
            x, deterministic
        )

        feats = {}
        blk = 0
        for s, depth in enumerate(cfg.depths):
            ch = cfg.stage_chs[s]
            for d in range(depth):
                stride = 2 if (s > 0 and d == 0) else 1
                is_last = d == depth - 1
                if is_last:
                    x = NTB(
                        features=ch,
                        head_dim=cfg.num_heads,
                        sr_ratio=cfg.sr_ratios[s],
                        stride=stride,
                        dtype=self.dtype,
                        name=f"features{blk}_ntb",
                    )(x, deterministic)
                else:
                    x = NCB(
                        features=ch, stride=stride, dtype=self.dtype,
                        name=f"features{blk}_ncb",
                    )(x, deterministic)
                if blk in self.hooks:
                    feats[blk] = x
                blk += 1
        assert len(feats) == 4, (self.hooks, blk)
        return tuple(feats[h] for h in self.hooks)


def make_next_vit_backbone(
    backbone: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Dtype = jnp.float32,
):
    cfg = NEXT_VIT_CONFIGS[backbone]
    hooks = tuple(hooks) if hooks is not None else NEXT_VIT_HOOKS[backbone]
    factory = functools.partial(
        NextViTBackbone, cfg=cfg, hooks=hooks, dtype=dtype
    )
    return factory, cfg.stage_chs
