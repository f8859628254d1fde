"""Swin Transformer V1 backbone (swinl12_384), flax-native.

Replaces the reference's timm wrapper (reference backbones/swin.py:6-12
via swin_common.py). V1 differs from V2 (swin2.py): pre-norm blocks,
a learned relative-position-bias table (not a CPB MLP), standard
scaled-dot-product attention with a full qkv bias, and patch merging
that norms *before* the reduction.

Handles inputs whose stage grids are not window multiples (the
reference feeds 256-px inputs to this 384-px model, loader.py:205-212)
by zero-padding to window multiples and masking padded tokens into a
separate attention region.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..bias_cache import cached_bias

from .swin2 import (
    drop_path,
    toeplitz_bias_expand,
    window_partition,
    window_reverse,
)

Dtype = Any


@dataclass(frozen=True)
class SwinV1Config:
    img_size: int = 384
    patch_size: int = 4
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2**i) for i in range(len(self.depths)))


SWIN1_CONFIGS = {
    "swinl12_384": SwinV1Config(),
    "swin1test_64": SwinV1Config(
        img_size=64, embed_dim=16, depths=(2, 2, 2, 2), num_heads=(1, 2, 4, 8),
        window_size=5,  # deliberately non-divisible -> exercises padding
    ),
}

SWIN1_HOOKS = {
    "swinl12_384": (1, 1, 17, 1),
    "swin1test_64": (1, 1, 1, 1),
}


@functools.lru_cache(maxsize=64)
def padded_attn_mask(
    H: int, W: int, Hp: int, Wp: int, wh: int, ww: int, sh: int, sw: int
) -> Optional[np.ndarray]:
    """(nW, N, N) additive mask handling shift regions AND zero-padding;
    None when no mask is needed."""
    if sh == 0 and sw == 0 and Hp == H and Wp == W:
        return None
    img_mask = np.full((Hp, Wp), -1, np.int32)  # -1 = padded region
    if sh == 0 and sw == 0:
        img_mask[:H, :W] = 0
    else:
        cnt = 0
        for hs in (slice(0, Hp - wh), slice(Hp - wh, Hp - sh), slice(Hp - sh, Hp)):
            for ws in (slice(0, Wp - ww), slice(Wp - ww, Wp - sw), slice(Wp - sw, Wp)):
                img_mask[hs, ws] = cnt
                cnt += 1
        pad = np.full((Hp, Wp), False)
        pad[H:, :] = True
        pad[:, W:] = True
        img_mask[pad] = -1
    mw = img_mask.reshape(Hp // wh, wh, Wp // ww, ww)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttentionV1(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int]
    # The bias-table param is sized by the CONFIGURED window (timm sizes
    # it at construction), not the resolution-clamped effective window —
    # otherwise the param shape would change with input size and real
    # checkpoints could not import at non-native resolutions. A clamped
    # effective window indexes into the center of the table.
    table_window: Optional[Tuple[int, int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        Bw, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bw, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)

        wh, ww = self.window
        twh, tww = self.table_window or self.window
        table = self.param(
            "rel_pos_table",
            nn.initializers.normal(0.02),
            ((2 * twh - 1) * (2 * tww - 1), H),
        )

        def compute_bias():
            # Scatter-free Toeplitz expansion == table[rel_index]
            # (swin2.toeplitz_bias_expand: one-hot einsums; backward is
            # matmuls, not a per-block scatter-add into the table).
            # jnp.asarray: params may be host numpy (structural_init).
            return toeplitz_bias_expand(jnp.asarray(table), wh, ww, twh, tww)

        # Param-derived constant — foldable at weight-bind time
        # (models/bias_cache.py; slow TPU gather otherwise). Keyed by
        # the effective window (resolution-clipped upstream).
        bias = cached_bias(self, f"rel_bias_{wh}x{ww}", compute_bias)
        attn = attn + bias.astype(jnp.float32)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, H, N, N)
            attn = attn + mask.astype(jnp.float32)[None, :, None]
            attn = attn.reshape(Bw, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinV1Block(nn.Module):
    dim: int
    num_heads: int
    input_resolution: Tuple[int, int]
    window_size: int
    shift: bool
    mlp_ratio: float
    drop_path_rate: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        Hr, Wr = self.input_resolution
        ws = min(self.window_size, Hr, Wr)
        shift = ws // 2 if (self.shift and ws < min(Hr, Wr)) else 0
        Hp = -(-Hr // ws) * ws
        Wp = -(-Wr // ws) * ws

        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        if (Hp, Wp) != (Hr, Wr):
            h = jnp.pad(h, ((0, 0), (0, Hp - Hr), (0, Wp - Wr), (0, 0)))
        if shift > 0:
            h = jnp.roll(h, shift=(-shift, -shift), axis=(1, 2))
        win = window_partition(h, ws, ws)
        mask_np = padded_attn_mask(Hr, Wr, Hp, Wp, ws, ws, shift, shift)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        win = WindowAttentionV1(
            dim=self.dim, num_heads=self.num_heads, window=(ws, ws),
            table_window=(self.window_size, self.window_size),
            dtype=self.dtype, name="attn",
        )(win, mask)
        h = window_reverse(win, ws, ws, Hp, Wp)
        if shift > 0:
            h = jnp.roll(h, shift=(shift, shift), axis=(1, 2))
        h = h[:, :Hr, :Wr]
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        x = shortcut + drop_path(h, self.drop_path_rate, deterministic, rng)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(
            int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1"
        )(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        return x + drop_path(h, self.drop_path_rate, deterministic, rng)


class PatchMergingV1(nn.Module):
    """V1 order: norm(4C) then Linear(4C -> 2C)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinV1Backbone(nn.Module):
    cfg: SwinV1Config
    hooks: Tuple[int, int, int, int] = (1, 1, 17, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        B, H, W, _ = x.shape
        x = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x).astype(self.dtype)

        grid = (H // cfg.patch_size, W // cfg.patch_size)
        total_depth = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_depth)
        feats = []
        blk_id = 0
        for i, depth in enumerate(cfg.depths):
            res = (grid[0] >> i, grid[1] >> i)
            captured = None
            for j in range(depth):
                x = SwinV1Block(
                    dim=cfg.stage_dims[i],
                    num_heads=cfg.num_heads[i],
                    input_resolution=res,
                    window_size=cfg.window_size,
                    shift=(j % 2 == 1),
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path_rate=float(dpr[blk_id]),
                    dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x, deterministic=deterministic)
                blk_id += 1
                if j == self.hooks[i]:
                    captured = x
            assert captured is not None
            feats.append(captured)
            if i < len(cfg.depths) - 1:
                x = PatchMergingV1(dtype=self.dtype, name=f"downsample{i}")(x)
        return tuple(feats)


def make_swin1_backbone(
    backbone: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Dtype = jnp.float32,
):
    cfg = SWIN1_CONFIGS[backbone]
    hooks = tuple(hooks) if hooks is not None else SWIN1_HOOKS[backbone]
    factory = functools.partial(
        SwinV1Backbone, cfg=cfg, hooks=hooks, dtype=dtype
    )
    return factory, cfg.stage_dims
