"""SOccDPT model family: V1 / V2 / V3 (+ occupancy head).

TPU-first rebuild of reference SOccDPT.py:470-724. All versions share
the forward contract of the reference: ``model(x)`` returns
``(inv_depth, segmentation, points, occupancy_grid_or_None)`` with

* ``inv_depth``     (B, H, W)     — upsampled to camera resolution
* ``segmentation``  (B, C, H, W)  — channels-first, like the reference
* ``points``        (B, H, W, 3)  — camera-frame point cloud
* ``occupancy_grid``(B, gx, gy, gz, C) when ``compute_occ``

Inputs are (B, 3, h, w) normalized images (reference convention); the
internal compute layout is NHWC. Set ``return_raw=True`` to skip the
geometry stage and get the native-resolution (inv_depth, seg) pair —
the efficient TPU training path (the loss can be evaluated at camera
resolution by resizing predictions exactly as the reference does).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.config import ModelConfig
from ..ops.geometry import get_semantic_occupancy
from .backbones import dpt_extras, make_backbone
from .dpt import DPT
from .heads import DepthHead, IdentityHead, OccupancyHead, SegHead

Dtype = Any


def _nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return x.transpose(0, 2, 3, 1)


def _head_features(cfg: ModelConfig):
    """(head_features_1, head_features_2); LeViT overrides to (64, 8)
    (reference loader.py:99-106)."""
    if cfg.model_type == "dpt_levit_224":
        return cfg.head_features_1 or 64, 8
    return cfg.head_features_1 or cfg.features, cfg.head_features_2


class _GeometryMixin:
    """Shared geometry tail (reference SOccDPT.get_semantic_occupancy)."""

    def _finish(
        self,
        inv_depth_nhwc: jnp.ndarray,
        seg_nhwc: jnp.ndarray,
        compute_occ: bool,
        return_raw: bool,
        deterministic: bool,
        output_size: Optional[Tuple[int, int]],
    ):
        cfg: ModelConfig = self.cfg
        inv_depth = inv_depth_nhwc[..., 0]  # (B, h, w)
        seg = seg_nhwc.transpose(0, 3, 1, 2)  # (B, C, h, w)
        if return_raw:
            return inv_depth, seg
        inv_d, seg_up, points, grid = get_semantic_occupancy(
            inv_depth,
            seg,
            cfg.camera,
            cfg.occupancy,
            cfg.num_classes,
            compute_occ=compute_occ,
            output_size=output_size,
            # real head: take the voxelizer's depth-folded channel-minor
            # layout directly (skips a ~3 ms/step minor-3 relayout); the
            # head returns the public (B, gx, gy, gz, C) grid either way
            grid_layout="folded_cz" if cfg.occupancy_head else "grid5d",
        )
        if grid is not None:
            grid = OccupancyHead(
                num_classes=cfg.num_classes,
                identity=not cfg.occupancy_head,
                dtype=self.dtype,
                name="occupancy_conv",
            )(grid, deterministic=deterministic)
        return inv_d, seg_up, points, grid


class SOccDPT_V1(nn.Module, _GeometryMixin):
    """Two independent DPTs (depth + seg), reference SOccDPT.py:470-523."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        compute_occ: Optional[bool] = None,
        return_raw: bool = False,
        output_size: Optional[Tuple[int, int]] = None,
    ):
        cfg = self.cfg
        x = _nchw_to_nhwc(x).astype(self.dtype)

        bb_d, chans = make_backbone(
            cfg.backbone, dtype=self.dtype, use_pallas=self.use_pallas,
            remat=self.remat,
        )
        hf1, hf2 = _head_features(cfg)
        depth_net = DPT(
            backbone=bb_d,
            in_channels=chans,
            head=partial(
                DepthHead,
                head_features_1=hf1,
                head_features_2=hf2,
                non_negative=cfg.non_negative,
                dtype=self.dtype,
            ),
            features=cfg.features,
            use_bn=False,
            dtype=self.dtype,
            name="depth_net",
            **dpt_extras(cfg.backbone, self.dtype),
        )
        bb_s, chans_s = make_backbone(
            cfg.backbone, dtype=self.dtype, use_pallas=self.use_pallas,
            remat=self.remat,
        )
        seg_net = DPT(
            backbone=bb_s,
            in_channels=chans_s,
            head=partial(
                SegHead,
                num_classes=cfg.num_classes,
                features=cfg.features,
                sigmoid=True,  # V1 seg model is always sigmoid (dpt.py:251)
                dtype=self.dtype,
            ),
            features=cfg.features,
            use_bn=True,  # DPTSegmentationModel forces use_bn (dpt.py:240)
            dtype=self.dtype,
            name="seg_net",
            **dpt_extras(cfg.backbone, self.dtype),
        )

        inv_depth = depth_net(x, deterministic=deterministic)
        seg = seg_net(x, deterministic=deterministic)
        return self._finish(
            inv_depth,
            seg,
            self._occ(compute_occ),
            return_raw,
            deterministic,
            output_size,
        )

    def _occ(self, compute_occ):
        return self.cfg.compute_occ if compute_occ is None else compute_occ


class SOccDPT_V2(nn.Module, _GeometryMixin):
    """One shared DPT trunk (identity head) + separate depth/seg heads,
    reference SOccDPT.py:526-623 (with the seg_ead/seg_head typo fixed —
    SURVEY.md §2.6)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        compute_occ: Optional[bool] = None,
        return_raw: bool = False,
        output_size: Optional[Tuple[int, int]] = None,
    ):
        cfg = self.cfg
        x = _nchw_to_nhwc(x).astype(self.dtype)
        bb, chans = make_backbone(
            cfg.backbone, dtype=self.dtype, use_pallas=self.use_pallas,
            remat=self.remat,
        )
        trunk = DPT(
            backbone=bb,
            in_channels=chans,
            head=IdentityHead,
            features=cfg.features,
            dtype=self.dtype,
            name="pretrained",
            **dpt_extras(cfg.backbone, self.dtype),
        )
        feats = trunk(x, deterministic=deterministic)
        hf1, hf2 = _head_features(cfg)
        inv_depth = DepthHead(
            head_features_1=hf1,
            head_features_2=hf2,
            non_negative=cfg.non_negative,
            dtype=self.dtype,
            name="depth_head",
        )(feats, deterministic=deterministic)
        seg = SegHead(
            num_classes=cfg.num_classes,
            features=cfg.features,
            sigmoid=cfg.sigmoid,
            dtype=self.dtype,
            name="seg_head",
        )(feats, deterministic=deterministic)
        occ = self.cfg.compute_occ if compute_occ is None else compute_occ
        return self._finish(
            inv_depth, seg, occ, return_raw, deterministic, output_size
        )


class SOccDPT_V3(nn.Module, _GeometryMixin):
    """Depth DPT with ``return_features``; seg head rides the depth
    decoder's fused features — the published flagship
    (reference SOccDPT.py:626-685)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        compute_occ: Optional[bool] = None,
        return_raw: bool = False,
        output_size: Optional[Tuple[int, int]] = None,
    ):
        cfg = self.cfg
        x = _nchw_to_nhwc(x).astype(self.dtype)
        bb, chans = make_backbone(
            cfg.backbone, dtype=self.dtype, use_pallas=self.use_pallas,
            remat=self.remat,
        )
        hf1, hf2 = _head_features(cfg)
        depth_net = DPT(
            backbone=bb,
            in_channels=chans,
            head=partial(
                DepthHead,
                head_features_1=hf1,
                head_features_2=hf2,
                non_negative=cfg.non_negative,
                dtype=self.dtype,
            ),
            features=cfg.features,
            return_features=True,
            dtype=self.dtype,
            name="depth_net",
            **dpt_extras(cfg.backbone, self.dtype),
        )
        inv_depth, feats = depth_net(x, deterministic=deterministic)
        seg = SegHead(
            num_classes=cfg.num_classes,
            features=cfg.features,
            sigmoid=cfg.sigmoid,
            dtype=self.dtype,
            name="seg_head",
        )(feats, deterministic=deterministic)
        occ = self.cfg.compute_occ if compute_occ is None else compute_occ
        return self._finish(
            inv_depth, seg, occ, return_raw, deterministic, output_size
        )


SOccDPT_versions = {1: SOccDPT_V1, 2: SOccDPT_V2, 3: SOccDPT_V3}


def build_model(
    cfg: ModelConfig, use_pallas: Optional[bool] = None, remat: bool = False
) -> nn.Module:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return SOccDPT_versions[cfg.version](
        cfg=cfg, dtype=dtype, use_pallas=use_pallas, remat=remat
    )


# --- Single-output adapters (reference SOccDPT.py:697-724) -----------------


def depth_net(apply_fn):
    """Wrap an apply fn to expose only the disparity output."""

    def fn(*args, **kwargs):
        return apply_fn(*args, **kwargs)[0]

    return fn


def seg_net(apply_fn):
    """Wrap an apply fn to expose only the segmentation output."""

    def fn(*args, **kwargs):
        return apply_fn(*args, **kwargs)[1]

    return fn
