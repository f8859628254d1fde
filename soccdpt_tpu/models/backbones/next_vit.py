"""Next-ViT-Large backbone (dpt_next_vit_large_384), flax-native.

Replaces the reference's timm wrapper with hooks on ``model.features[i]``
(reference backbones/next_vit.py:11-43; hooks [2, 6, 36, 39] = last
block of each stage, dpt.py:79-84; hook channels [96, 256, 512, 1024],
dpt.py:91-94). The block structure follows the official bytedance
Next-ViT spec exactly so torch checkpoints import 1:1
(core/torch_import.convert_next_vit_dpt_keys):

* 4-conv stem (strides 2,1,1,2 -> /4);
* per-stage block plans ``[NCB]*k + [NTB]`` with the official channel
  progression (stage 2 of Large repeats [384,384,384,384,512] x 6);
* NCB = PatchEmbed -> +MHCA -> +Mlp(BN-normed input); MHCA = grouped
  3x3 conv (head groups) + BN/ReLU + 1x1 projection;
* NTB = PatchEmbed -> +E_MHSA(BN-normed) -> 1x1 projection branch
  +MHCA -> channel concat -> +Mlp(BN-normed); E_MHSA is global
  attention whose keys/values are average-pooled over the *flattened*
  token sequence (kernel sr_ratio^2, the official 1-D pooling) with a
  BatchNorm after pooling;
* all convs are BN-normalized (eps 1e-5), activations ReLU.

Everything runs NHWC; module names mirror the torch attribute names so
the weight importer is mechanical.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _make_divisible(v: float, divisor: int = 32) -> int:
    """Official mobilenet rounding used by Next-ViT for hidden/branch
    widths."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclass(frozen=True)
class NextViTConfig:
    stem_chs: Tuple[int, int, int] = (64, 32, 64)
    depths: Tuple[int, int, int, int] = (3, 4, 30, 3)
    strides: Tuple[int, int, int, int] = (1, 2, 2, 2)
    sr_ratios: Tuple[int, int, int, int] = (8, 4, 2, 1)
    head_dim: int = 32
    mix_block_ratio: float = 0.75
    divisor: int = 32  # _make_divisible granularity (official: 32)
    drop_path_rate: float = 0.0
    # Per-stage output-channel plans; None -> official Large rule.
    stage_out_channels: Optional[Tuple[Tuple[int, ...], ...]] = None

    def plan(self) -> List[Tuple[str, int, int, int, float]]:
        """Flat block plan: (type, out_ch, stride, sr_ratio, dpr)."""
        if self.stage_out_channels is not None:
            out_chs = [list(s) for s in self.stage_out_channels]
        else:
            d = self.depths
            out_chs = [
                [96] * d[0],
                [192] * (d[1] - 1) + [256],
                [384, 384, 384, 384, 512] * (d[2] // 5),
                [768] * (d[3] - 1) + [1024],
            ]
        types = [
            ["ncb"] * self.depths[0],
            ["ncb"] * (self.depths[1] - 1) + ["ntb"],
            ["ncb", "ncb", "ncb", "ncb", "ntb"] * (self.depths[2] // 5),
            ["ncb"] * (self.depths[3] - 1) + ["ntb"],
        ]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        plan = []
        i = 0
        for s in range(4):
            for b in range(self.depths[s]):
                stride = 2 if (self.strides[s] == 2 and b == 0) else 1
                plan.append(
                    (types[s][b], out_chs[s][b], stride, self.sr_ratios[s],
                     float(dpr[i]))
                )
                i += 1
        return plan


NEXT_VIT_CONFIGS = {
    "next_vit_large_6m": NextViTConfig(),
    "nextvittest_64": NextViTConfig(
        stem_chs=(8, 4, 8),
        depths=(1, 2, 5, 2),
        sr_ratios=(2, 2, 1, 1),
        head_dim=8,
        divisor=8,
        stage_out_channels=((16,), (24, 32), (24, 24, 24, 24, 32), (48, 64)),
    ),
}

NEXT_VIT_HOOKS = {
    "next_vit_large_6m": (2, 6, 36, 39),
    "nextvittest_64": (0, 2, 7, 9),
}


def _drop_path(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class ConvBNReLU(nn.Module):
    """conv3x3 (optionally grouped/strided, no bias) + BN + ReLU
    (official ConvBNReLU: children ``conv``/``norm``)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
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
            dtype=jnp.float32, name="norm",
        )(x).astype(self.dtype)
        return nn.relu(x)


class PatchEmbed(nn.Module):
    """Official PatchEmbed: stride 2 -> 2x2 avgpool + 1x1 conv + BN;
    channel change -> 1x1 conv + BN; else identity (no params)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.stride == 1 and x.shape[-1] == self.features:
            return x
        if self.stride == 2:
            assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, x.shape
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="norm",
        )(x).astype(self.dtype)


class MHCA(nn.Module):
    """Multi-head conv attention: grouped 3x3 conv (one group per head)
    + BN + ReLU + 1x1 projection (official: ``group_conv3x3``/``norm``/
    ``projection``)."""

    features: int
    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        groups = max(self.features // self.head_dim, 1)
        h = nn.Conv(
            self.features, (3, 3), padding=1, feature_group_count=groups,
            use_bias=False, dtype=self.dtype, name="group_conv3x3",
        )(x)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="norm",
        )(h).astype(self.dtype)
        h = nn.relu(h)
        return nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            name="projection",
        )(h)


class Mlp(nn.Module):
    """1x1 conv MLP with bias (official Mlp: ``conv1``/``conv2``);
    hidden width rounded by _make_divisible."""

    features: int
    mlp_ratio: float
    divisor: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = _make_divisible(self.features * self.mlp_ratio, self.divisor)
        h = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv2")(h)


class NCB(nn.Module):
    """Next Convolution Block (official NCB): PatchEmbed -> +MHCA ->
    +Mlp(BN(x))."""

    features: int
    stride: int = 1
    head_dim: int = 32
    mlp_ratio: float = 3.0
    divisor: int = 32
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed(
            self.features, self.stride, dtype=self.dtype, name="patch_embed"
        )(x, deterministic)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        h = MHCA(self.features, self.head_dim, dtype=self.dtype, name="mhca")(
            x, deterministic
        )
        x = x + _drop_path(h, self.drop_path_rate, deterministic, rng)
        out = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="norm",
        )(x).astype(self.dtype)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        h = Mlp(
            self.features, self.mlp_ratio, self.divisor, dtype=self.dtype,
            name="mlp",
        )(out, deterministic)
        return x + _drop_path(h, self.drop_path_rate, deterministic, rng)


class E_MHSA(nn.Module):
    """Efficient global MHSA (official E_MHSA): separate q/k/v Linears;
    keys/values average-pooled over the *flattened* token sequence with
    kernel sr_ratio^2 and BN-normalized. Input/output (B, N, C)."""

    features: int
    head_dim: int = 32
    sr_ratio: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        heads = max(C // self.head_dim, 1)
        hd = C // heads
        q = nn.Dense(C, dtype=self.dtype, name="q")(x).reshape(B, N, heads, hd)
        kv_in = x
        if self.sr_ratio > 1:
            r2 = self.sr_ratio**2
            assert N % r2 == 0, (N, r2)
            kv_in = x.reshape(B, N // r2, r2, C).mean(axis=2)
            kv_in = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9,
                dtype=jnp.float32, name="norm",
            )(kv_in).astype(self.dtype)
        M = kv_in.shape[1]
        k = nn.Dense(C, dtype=self.dtype, name="k")(kv_in).reshape(
            B, M, heads, hd
        )
        v = nn.Dense(C, dtype=self.dtype, name="v")(kv_in).reshape(
            B, M, heads, hd
        )
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (self.head_dim**-0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="proj")(
            out.reshape(B, N, C)
        )


class NTB(nn.Module):
    """Next Transformer Block (official NTB): PatchEmbed to the MHSA
    branch width -> +E_MHSA(BN(x)) -> 1x1-projected MHCA branch ->
    channel concat -> +Mlp(BN(cat))."""

    features: int
    stride: int = 1
    sr_ratio: int = 1
    head_dim: int = 32
    mix_block_ratio: float = 0.75
    mlp_ratio: float = 2.0
    divisor: int = 32
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c_mhsa = _make_divisible(
            self.features * self.mix_block_ratio, self.divisor
        )
        c_mhca = self.features - c_mhsa
        x = PatchEmbed(
            c_mhsa, self.stride, dtype=self.dtype, name="patch_embed"
        )(x, deterministic)
        B, H, W, _ = x.shape

        out = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="norm1",
        )(x).astype(self.dtype)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        h = E_MHSA(
            c_mhsa, self.head_dim, self.sr_ratio, dtype=self.dtype,
            name="e_mhsa",
        )(out.reshape(B, H * W, c_mhsa), deterministic).reshape(B, H, W, c_mhsa)
        x = x + _drop_path(
            h, self.drop_path_rate * self.mix_block_ratio, deterministic, rng
        )

        y = PatchEmbed(c_mhca, 1, dtype=self.dtype, name="projection")(
            x, deterministic
        )
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        h = MHCA(c_mhca, self.head_dim, dtype=self.dtype, name="mhca")(
            y, deterministic
        )
        y = y + _drop_path(
            h,
            self.drop_path_rate * (1.0 - self.mix_block_ratio),
            deterministic,
            rng,
        )

        z = jnp.concatenate([x, y], axis=-1)
        out = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9,
            dtype=jnp.float32, name="norm2",
        )(z).astype(self.dtype)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        h = Mlp(
            self.features, self.mlp_ratio, self.divisor, dtype=self.dtype,
            name="mlp",
        )(out, deterministic)
        return z + _drop_path(h, self.drop_path_rate, deterministic, rng)


class NextViTBackbone(nn.Module):
    cfg: NextViTConfig
    hooks: Tuple[int, int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        # official 4-conv stem: strides 2,1,1,2 -> /4
        s0, s1, s2 = cfg.stem_chs
        for i, (ch, st) in enumerate(
            ((s0, 2), (s1, 1), (s2, 1), (s2, 2))
        ):
            x = ConvBNReLU(ch, 3, st, dtype=self.dtype, name=f"stem{i}")(
                x, deterministic
            )

        feats = {}
        for blk, (btype, ch, stride, sr, dpr) in enumerate(cfg.plan()):
            if btype == "ntb":
                x = NTB(
                    features=ch,
                    stride=stride,
                    sr_ratio=sr,
                    head_dim=cfg.head_dim,
                    mix_block_ratio=cfg.mix_block_ratio,
                    divisor=cfg.divisor,
                    drop_path_rate=dpr,
                    dtype=self.dtype,
                    name=f"features{blk}",
                )(x, deterministic)
            else:
                x = NCB(
                    features=ch,
                    stride=stride,
                    head_dim=cfg.head_dim,
                    divisor=cfg.divisor,
                    drop_path_rate=dpr,
                    dtype=self.dtype,
                    name=f"features{blk}",
                )(x, deterministic)
            if blk in self.hooks:
                feats[blk] = x
        assert len(feats) == 4, (self.hooks, len(feats))
        return tuple(feats[h] for h in self.hooks)


def make_next_vit_backbone(
    backbone: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Dtype = jnp.float32,
):
    cfg = NEXT_VIT_CONFIGS[backbone]
    hooks = tuple(hooks) if hooks is not None else NEXT_VIT_HOOKS[backbone]
    plan = cfg.plan()
    chans = tuple(plan[h][1] for h in hooks)
    factory = functools.partial(
        NextViTBackbone, cfg=cfg, hooks=hooks, dtype=dtype
    )
    return factory, chans
