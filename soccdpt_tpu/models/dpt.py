"""DPT trunk: reassemble ("scratch") convs + RefineNet-style fusion decoder.

TPU-first rebuild of the reference's DPT core (reference dpt.py:30-182,
blocks.py:139-497). All tensors are NHWC (feature dim on the TPU lane
axis); conv+activation chains are left to XLA to fuse. Upsampling inside
fusion blocks is bilinear align_corners=True, matching reference
blocks.py:488-493 exactly (see ops/resize.py).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_hw, upsample2x_hw

Dtype = Any


class ResidualConvUnit(nn.Module):
    """relu -> conv3x3 -> [bn] -> relu -> conv3x3 -> [bn], + skip
    (reference blocks.py:348-416)."""

    features: int
    use_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out = nn.relu(x)
        out = nn.Conv(
            self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1"
        )(out)
        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=deterministic,
                momentum=0.9,
                dtype=jnp.float32,
                name="bn1",
            )(out).astype(self.dtype)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2"
        )(out)
        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=deterministic,
                momentum=0.9,
                dtype=jnp.float32,
                name="bn2",
            )(out).astype(self.dtype)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Fuse an upper path with a lateral skip, then upsample
    (reference blocks.py:419-497, _make_fusion_block dpt.py:18-27)."""

    features: int
    use_bn: bool = False
    # Fixed output size override (LeViT refinenet3 uses 7, dpt.py:125-127).
    size: Optional[Tuple[int, int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip: Optional[jnp.ndarray] = None,
        size: Optional[Tuple[int, int]] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(
                self.features, self.use_bn, self.dtype, name="res_conv_unit1"
            )(skip, deterministic)
        out = ResidualConvUnit(
            self.features, self.use_bn, self.dtype, name="res_conv_unit2"
        )(out, deterministic)

        # The reference applies out_conv AFTER the bilinear upsample
        # (blocks.py:488-495). A 1x1 conv is a per-pixel channel map and
        # bilinear resize is a per-channel spatial map: they commute
        # exactly, so the conv runs here at the pre-upsample resolution
        # — 4x fewer conv FLOPs and one full-resolution tensor round-trip
        # less HBM traffic per refinenet (PERF.md "decoder HBM gap").
        # Math identical to the reference; float summation order differs.
        out = nn.Conv(
            self.features, (1, 1), dtype=self.dtype, name="out_conv"
        )(out)
        target = size if size is not None else self.size
        if target is None:
            out = upsample2x_hw(out, "bilinear", align_corners=True)
        else:
            out = resize_hw(out, tuple(target), "bilinear", align_corners=True)
        return out


class DPT(nn.Module):
    """Backbone + scratch reassemble + fusion decoder + pluggable head.

    ``backbone`` and ``head`` are module *factories* (e.g. a
    ``functools.partial`` over the module class): they are constructed
    inside this module's scope so their params live under
    ``<dpt>/backbone`` and ``<dpt>/head`` — the layout the encoder
    freeze/unfreeze helpers and the torch-weight importer rely on.
    The backbone must return 3 or 4 NHWC stage features; ``in_channels``
    are their widths (reference _make_encoder tables, blocks.py:43-131).
    If ``return_features`` the pre-head feature map is returned alongside
    the head output (used by SOccDPT V3, reference dpt.py:179-181).
    """

    backbone: Callable[..., nn.Module]
    in_channels: Sequence[int]
    head: Callable[..., nn.Module]
    features: int = 256
    use_bn: bool = False
    return_features: bool = False
    size_refinenet3: Optional[Tuple[int, int]] = None
    stem_transpose: Optional[Callable[..., nn.Module]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        backbone = self.backbone(name="backbone")
        layers = backbone(x, deterministic=deterministic)
        n = len(layers)
        assert n == len(self.in_channels), (n, self.in_channels)

        rn = [
            nn.Conv(
                self.features,
                (3, 3),
                padding=1,
                use_bias=False,
                dtype=self.dtype,
                name=f"layer{i + 1}_rn",
            )(layers[i])
            for i in range(n)
        ]

        def fusion(name, size=None):
            return FeatureFusionBlock(
                self.features,
                self.use_bn,
                size=size,
                dtype=self.dtype,
                name=name,
            )

        if n == 4:
            path = fusion("refinenet4")(
                rn[3], size=rn[2].shape[1:3], deterministic=deterministic
            )
            path = fusion("refinenet3", self.size_refinenet3)(
                path, rn[2], size=rn[1].shape[1:3], deterministic=deterministic
            )
        else:
            path = fusion("refinenet3", self.size_refinenet3)(
                rn[2], size=rn[1].shape[1:3], deterministic=deterministic
            )
        path = fusion("refinenet2")(
            path, rn[1], size=rn[0].shape[1:3], deterministic=deterministic
        )
        path = fusion("refinenet1")(path, rn[0], deterministic=deterministic)

        if self.stem_transpose is not None:
            path = self.stem_transpose(name="stem_transpose")(path)

        out = self.head(name="head")(path, deterministic=deterministic)
        if self.return_features:
            return out, path
        return out
