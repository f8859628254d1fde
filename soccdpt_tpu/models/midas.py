"""MidasNet v2.1 (legacy MiDaS): ResNeXt101 encoder + legacy fusion.

The reference scores ``midas_v21`` through its baseline harness
(eval_others.py via torch.hub); here it is a first-class model type so
the BASELINE config "MiDaS v21 depth-only, single image at 256" runs
natively. Legacy decoder (reference blocks.py:276-345): ResidualConvUnit
without pre-BN skip-add ordering differences and FeatureFusionBlock that
adds the lateral *before* the shared RCU, then 2x bilinear
align_corners=True upsampling; depth head conv3x3->up2x->conv3x3->relu
->conv1x1->relu.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .backbones.resnext import make_resnext_backbone
from ..ops.resize import upsample2x_hw

Dtype = Any


class LegacyRCU(nn.Module):
    """relu-conv-relu-conv + skip (reference blocks.py:276-311)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        return h + x


class LegacyFusionBlock(nn.Module):
    """output (+ rcu1(skip)) -> rcu2 -> 2x up (reference blocks.py:314-345)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip=None) -> jnp.ndarray:
        out = x
        if skip is not None:
            out = out + LegacyRCU(self.features, self.dtype, name="rcu1")(skip)
        out = LegacyRCU(self.features, self.dtype, name="rcu2")(out)
        return upsample2x_hw(out, "bilinear", align_corners=True)


class MidasNetV21(nn.Module):
    """Depth-only model; ``__call__`` returns inverse depth (B, H, W)."""

    features: int = 256
    non_negative: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, **_ignored
    ) -> jnp.ndarray:
        x = x.transpose(0, 2, 3, 1).astype(self.dtype)  # NCHW -> NHWC
        factory, chans = make_resnext_backbone("resnext101_wsl", dtype=self.dtype)
        feats = factory(name="backbone")(x, deterministic=deterministic)

        rn = [
            nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"layer{i + 1}_rn",
            )(feats[i])
            for i in range(4)
        ]
        path = LegacyFusionBlock(self.features, self.dtype, name="refinenet4")(rn[3])
        path = LegacyFusionBlock(self.features, self.dtype, name="refinenet3")(
            path, rn[2]
        )
        path = LegacyFusionBlock(self.features, self.dtype, name="refinenet2")(
            path, rn[1]
        )
        path = LegacyFusionBlock(self.features, self.dtype, name="refinenet1")(
            path, rn[0]
        )

        h = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="head_conv1")(path)
        h = upsample2x_hw(h, "bilinear", align_corners=False)
        h = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(h)
        if self.non_negative:
            h = nn.relu(h)
        return h[..., 0]
