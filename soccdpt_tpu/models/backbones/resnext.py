"""ResNeXt-101 32x8d backbone (the MiDaS v2.1 encoder).

The reference exposes this encoder via torch.hub
(``resnext101_32x8d_wsl``, reference blocks.py:219-236) for the legacy
``midas_v21`` model family scored by its baseline harness. Standard
ResNeXt: 7x7/2 stem + maxpool, four bottleneck stages (3, 4, 23, 3
blocks; grouped 3x3 convs, groups=32, width 8) with channels
(256, 512, 1024, 2048) at strides (4, 8, 16, 32).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclass(frozen=True)
class ResNeXtConfig:
    stage_blocks: Tuple[int, int, int, int] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    stem_width: int = 64


RESNEXT_CONFIGS = {
    "resnext101_wsl": ResNeXtConfig(),
    "resnexttest_64": ResNeXtConfig(
        stage_blocks=(1, 1, 1, 1), groups=4, width_per_group=4, stem_width=16
    ),
}


class Bottleneck(nn.Module):
    mid: int
    out: int
    groups: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9,
                dtype=jnp.float32, name=name,
            )

        h = nn.Conv(
            self.mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        h = nn.relu(bn("bn1")(h).astype(self.dtype))
        h = nn.Conv(
            self.mid, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        h = nn.relu(bn("bn2")(h).astype(self.dtype))
        h = nn.Conv(
            self.out, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(h)
        h = bn("bn3")(h).astype(self.dtype)

        if x.shape[-1] != self.out or self.stride != 1:
            x = nn.Conv(
                self.out, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            x = bn("downsample_bn")(x).astype(self.dtype)
        return nn.relu(x + h)


class ResNeXtBackbone(nn.Module):
    cfg: ResNeXtConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        w = cfg.stem_width
        h = nn.Conv(
            w, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="stem_bn",
        )(h).astype(self.dtype)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))

        feats = []
        base = cfg.groups * cfg.width_per_group  # 256 for 32x8d
        for s, depth in enumerate(cfg.stage_blocks):
            out_ch = w * 4 * (2**s)
            mid_ch = base * (2**s)
            for b in range(depth):
                h = Bottleneck(
                    mid=mid_ch,
                    out=out_ch,
                    groups=cfg.groups,
                    stride=2 if (s > 0 and b == 0) else 1,
                    dtype=self.dtype,
                    name=f"stage{s}_block{b}",
                )(h, deterministic)
            feats.append(h)
        return tuple(feats)


def make_resnext_backbone(
    backbone: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Dtype = jnp.float32,
):
    cfg = RESNEXT_CONFIGS[backbone]
    factory = functools.partial(ResNeXtBackbone, cfg=cfg, dtype=dtype)
    chans = tuple(cfg.stem_width * 4 * (2**s) for s in range(4))
    return factory, chans
