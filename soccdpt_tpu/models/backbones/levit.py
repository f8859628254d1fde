"""LeViT-384 backbone (dpt_levit_224), flax-native.

Replaces the reference's timm wrapper (reference backbones/levit.py:
23-57, 135-139). LeViT is a 3-stage conv/attention hybrid at 224 px:
a 16x conv stem (4 conv-BN-hardswish, stride 2 each) produces a 14x14
token grid; three attention stages at 14/7/4 resolution with
attention-downsample blocks between them. All normalization is
BatchNorm (timm applies BN over flattened tokens); attention uses
learned per-head position biases indexed by relative offsets and a
hardswish MLP.

Hook indices count the flattened block sequence like timm's
``model.blocks`` (attention and MLP residuals each count as one
element, downsample pairs included): the reference hooks [3, 11, 21]
capture mid-stage activations of stages 0/1/2 (reference dpt.py:85).
The captured tokens are reshaped to NHWC at grids 14/7/4 (ceil
divisions, reference backbones/levit.py:39-55).
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

Dtype = Any


@dataclass(frozen=True)
class LeViTConfig:
    img_size: int = 224
    embed_dims: Tuple[int, int, int] = (384, 512, 768)
    num_heads: Tuple[int, int, int] = (6, 9, 12)
    depths: Tuple[int, int, int] = (4, 4, 4)
    key_dim: int = 32
    mlp_ratio: float = 2.0
    attn_ratio: float = 2.0


LEVIT_CONFIGS = {
    "levit_384": LeViTConfig(),
    "levittest_64": LeViTConfig(
        img_size=64, embed_dims=(32, 48, 64), num_heads=(2, 3, 4),
        depths=(2, 2, 2), key_dim=16,
    ),
}

LEVIT_HOOKS = {
    "levit_384": (3, 11, 21),
    "levittest_64": (1, 7, 13),
}


@functools.lru_cache(maxsize=32)
def _attn_bias_index(gh: int, gw: int, qh: int, qw: int, q_stride: int) -> np.ndarray:
    """(N_q, N_kv) index into the per-head bias table of unique
    |offset| pairs (LeViT attention_bias_idxs)."""
    kv = np.stack(
        np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    ).reshape(2, -1)
    q = np.stack(
        np.meshgrid(
            np.arange(qh) * q_stride, np.arange(qw) * q_stride, indexing="ij"
        )
    ).reshape(2, -1)
    offs = np.abs(q[:, :, None] - kv[:, None, :])  # (2, Nq, Nkv)
    idx = offs[0] * gw + offs[1]
    return idx.astype(np.int64)


class BNDense(nn.Module):
    """Linear (no bias) + BatchNorm over tokens (timm LeViT LinearNorm)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="linear")(x)
        B, N, C = x.shape
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="bn",
        )(x.reshape(B * N, C)).astype(self.dtype)
        return x.reshape(B, N, C)


class LeViTAttention(nn.Module):
    dim_out: int
    num_heads: int
    key_dim: int
    attn_ratio: float
    grid: Tuple[int, int]
    q_stride: int = 1  # 2 for downsample attention
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        gh, gw = self.grid
        H = self.num_heads
        kd = self.key_dim
        vd = int(self.attn_ratio * kd)
        B, N, _ = x.shape

        if self.q_stride > 1:
            # timm AttentionSubsample: separate kv + strided q
            # (per-head column layout [k | v] / [q]).
            kv = BNDense(H * (kd + vd), dtype=self.dtype, name="kv")(
                x, deterministic
            )
            k, v = jnp.split(kv.reshape(B, N, H, kd + vd), [kd], axis=-1)
            qh, qw = -(-gh // self.q_stride), -(-gw // self.q_stride)
            xq = x.reshape(B, gh, gw, -1)[
                :, :: self.q_stride, :: self.q_stride
            ].reshape(B, qh * qw, -1)
            q = BNDense(H * kd, dtype=self.dtype, name="q")(xq, deterministic)
            q = q.reshape(B, qh * qw, H, kd)
        else:
            # timm Attention: ONE fused qkv matmul (per-head column
            # layout [q | k | v]) — one large MXU matmul instead of two.
            qh, qw = gh, gw
            qkv = BNDense(H * (2 * kd + vd), dtype=self.dtype, name="qkv")(
                x, deterministic
            )
            q, k, v = jnp.split(
                qkv.reshape(B, N, H, 2 * kd + vd), [kd, 2 * kd], axis=-1
            )

        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (kd**-0.5)

        bias_table = self.param(
            "attn_bias", nn.initializers.zeros, (H, gh * gw)
        )

        def compute_bias():
            idx = jnp.asarray(
                _attn_bias_index(gh, gw, qh, qw, self.q_stride).reshape(-1)
            )
            # jnp.asarray first: params may arrive as host numpy arrays
            # (structural_init) and numpy fancy-indexing breaks under an
            # inner trace (fori_loop body) where the index is a tracer.
            return jnp.asarray(bias_table)[:, idx].reshape(
                H, qh * qw, gh * gw
            )

        # Param-derived constant — foldable at weight-bind time
        # (models/bias_cache.py); keyed by grid so caches from other
        # input resolutions are ignored.
        bias = cached_bias(
            self, f"attn_bias_{gh}x{gw}_{qh}x{qw}", compute_bias
        )
        attn = attn + bias.astype(jnp.float32)[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)

        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.reshape(B, qh * qw, H * vd)
        out = nn.hard_swish(out)
        return BNDense(self.dim_out, dtype=self.dtype, name="proj")(
            out, deterministic
        )


class LeViTMLP(nn.Module):
    dim: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = BNDense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(
            x, deterministic
        )
        h = nn.hard_swish(h)
        return BNDense(self.dim, dtype=self.dtype, name="fc2")(h, deterministic)


class ConvBN(nn.Module):
    features: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="bn",
        )(x).astype(self.dtype)


class LeViTBackbone(nn.Module):
    """Returns 3 feature maps (NHWC) at grids g, ceil(g/2), ceil(g/4)."""

    cfg: LeViTConfig
    hooks: Tuple[int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        B = x.shape[0]
        c0 = cfg.embed_dims[0]
        # 16x conv stem (timm stem_b16)
        for i, ch in enumerate((c0 // 8, c0 // 4, c0 // 2, c0)):
            x = ConvBN(ch, dtype=self.dtype, name=f"stem{i}")(x, deterministic)
            if i < 3:
                x = nn.hard_swish(x)
        gh, gw = x.shape[1], x.shape[2]
        tokens = x.reshape(B, gh * gw, c0)

        feats = {}
        blk = 0
        grid = (gh, gw)
        for s in range(3):
            dim = cfg.embed_dims[s]
            for d in range(cfg.depths[s]):
                tokens = tokens + LeViTAttention(
                    dim_out=dim,
                    num_heads=cfg.num_heads[s],
                    key_dim=cfg.key_dim,
                    attn_ratio=cfg.attn_ratio,
                    grid=grid,
                    dtype=self.dtype,
                    name=f"s{s}_attn{d}",
                )(tokens, deterministic)
                if blk in self.hooks:
                    feats[blk] = (tokens, grid, dim)
                blk += 1
                tokens = tokens + LeViTMLP(
                    dim=dim, mlp_ratio=cfg.mlp_ratio, dtype=self.dtype,
                    name=f"s{s}_mlp{d}",
                )(tokens, deterministic)
                if blk in self.hooks:
                    feats[blk] = (tokens, grid, dim)
                blk += 1
            if s < 2:
                new_grid = (-(-grid[0] // 2), -(-grid[1] // 2))
                tokens = LeViTAttention(
                    dim_out=cfg.embed_dims[s + 1],
                    # timm's down_ops use embed_dim[s] // key_dim heads
                    # (12 and 16 for levit_384), NOT the next stage's
                    # num_heads — using num_heads[s+1] here gives wrong
                    # kv/q param shapes vs real checkpoints. Caught by
                    # the whole-backbone HF parity test.
                    num_heads=cfg.embed_dims[s] // cfg.key_dim,
                    key_dim=cfg.key_dim,
                    attn_ratio=2 * cfg.attn_ratio,
                    grid=grid,
                    q_stride=2,
                    dtype=self.dtype,
                    name=f"downsample{s}_attn",
                )(tokens, deterministic)
                if blk in self.hooks:
                    feats[blk] = (tokens, new_grid, cfg.embed_dims[s + 1])
                blk += 1
                tokens = tokens + LeViTMLP(
                    dim=cfg.embed_dims[s + 1],
                    mlp_ratio=cfg.mlp_ratio,
                    dtype=self.dtype,
                    name=f"downsample{s}_mlp",
                )(tokens, deterministic)
                if blk in self.hooks:
                    feats[blk] = (tokens, new_grid, cfg.embed_dims[s + 1])
                blk += 1
                grid = new_grid

        assert len(feats) == 3, (
            f"hooks {self.hooks} resolved {len(feats)} captures "
            f"(total blocks {blk})"
        )
        outs = []
        for h in self.hooks:
            tok, (fh, fw), dim = feats[h]
            outs.append(tok.reshape(B, fh, fw, dim))
        return tuple(outs)


class StemTranspose(nn.Module):
    """4x transposed-conv upsampling head inserted before the DPT output
    head for LeViT (reference stem_b4_transpose, backbones/levit.py:
    119-132): 256 -> 128 -> 64 channels, 2x each."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.ConvTranspose(
            128, (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype, name="up1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="bn1",
        )(x).astype(self.dtype)
        x = nn.hard_swish(x)
        x = nn.ConvTranspose(
            64, (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype, name="up2",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="bn2",
        )(x).astype(self.dtype)
        return nn.hard_swish(x)


def make_levit_backbone(
    backbone: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Dtype = jnp.float32,
):
    cfg = LEVIT_CONFIGS[backbone]
    hooks = tuple(hooks) if hooks is not None else LEVIT_HOOKS[backbone]
    factory = functools.partial(
        LeViTBackbone, cfg=cfg, hooks=hooks, dtype=dtype
    )
    # scratch channels [384, 512, 768] (reference blocks.py:91-95)
    chans = tuple(cfg.embed_dims)
    return factory, chans
