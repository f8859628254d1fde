"""Torch re-derivation of the official bytedance Next-ViT trunk, used as
the composition oracle for the flax backbone.

Written from the published architecture (Next-ViT paper + the official
``bytedance/Next-ViT`` module structure the reference wraps through
``timm.create_model("nextvit_large")``, reference backbones/next_vit.py:
36-43). Neither timm nor the bytedance repo is installable in this
zero-egress environment, so this torch mirror is the strongest oracle
available: it exercises eval-mode BatchNorm with non-trivial running
stats, grouped convs, 1-D pooled attention kv, concat ordering, and the
timm ``features[i]`` hook taps in a second framework with an
independent execution path (torch eager vs XLA).
"""
from __future__ import annotations

import torch
import torch.nn as nn


def make_divisible(v, divisor=32):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU(nn.Module):
    def __init__(self, in_ch, out_ch, kernel=3, stride=1, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(
            in_ch, out_ch, kernel, stride, kernel // 2, groups=groups,
            bias=False,
        )
        self.norm = nn.BatchNorm2d(out_ch)
        self.act = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))


class PatchEmbed(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        if stride == 2:
            self.avgpool = nn.AvgPool2d(
                (2, 2), stride=2, ceil_mode=True, count_include_pad=False
            )
            self.conv = nn.Conv2d(in_ch, out_ch, 1, 1, 0, bias=False)
            self.norm = nn.BatchNorm2d(out_ch)
        elif in_ch != out_ch:
            self.avgpool = nn.Identity()
            self.conv = nn.Conv2d(in_ch, out_ch, 1, 1, 0, bias=False)
            self.norm = nn.BatchNorm2d(out_ch)
        else:
            self.avgpool = nn.Identity()
            self.conv = nn.Identity()
            self.norm = nn.Identity()

    def forward(self, x):
        return self.norm(self.conv(self.avgpool(x)))


class MHCA(nn.Module):
    def __init__(self, out_ch, head_dim):
        super().__init__()
        self.group_conv3x3 = nn.Conv2d(
            out_ch, out_ch, 3, 1, 1, groups=out_ch // head_dim, bias=False
        )
        self.norm = nn.BatchNorm2d(out_ch)
        self.act = nn.ReLU(inplace=True)
        self.projection = nn.Conv2d(out_ch, out_ch, 1, bias=False)

    def forward(self, x):
        return self.projection(self.act(self.norm(self.group_conv3x3(x))))


class Mlp(nn.Module):
    def __init__(self, in_features, mlp_ratio, divisor=32):
        super().__init__()
        hidden = make_divisible(in_features * mlp_ratio, divisor)
        self.conv1 = nn.Conv2d(in_features, hidden, 1, bias=True)
        self.act = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(hidden, in_features, 1, bias=True)

    def forward(self, x):
        return self.conv2(self.act(self.conv1(x)))


class NCB(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1, head_dim=32, mlp_ratio=3.0,
                 divisor=32):
        super().__init__()
        self.patch_embed = PatchEmbed(in_ch, out_ch, stride)
        self.mhca = MHCA(out_ch, head_dim)
        self.norm = nn.BatchNorm2d(out_ch)
        self.mlp = Mlp(out_ch, mlp_ratio, divisor)

    def forward(self, x):
        x = self.patch_embed(x)
        x = x + self.mhca(x)
        out = self.norm(x)
        return x + self.mlp(out)


class E_MHSA(nn.Module):
    def __init__(self, dim, head_dim=32, sr_ratio=1, qkv_bias=True):
        super().__init__()
        self.dim = dim
        self.num_heads = dim // head_dim
        self.head_dim = head_dim
        self.scale = head_dim**-0.5
        self.q = nn.Linear(dim, dim, bias=qkv_bias)
        self.k = nn.Linear(dim, dim, bias=qkv_bias)
        self.v = nn.Linear(dim, dim, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        self.N_ratio = sr_ratio**2
        if sr_ratio > 1:
            self.sr = nn.AvgPool1d(self.N_ratio, stride=self.N_ratio)
            self.norm = nn.BatchNorm1d(dim)

    def forward(self, x):
        B, N, C = x.shape
        q = (
            self.q(x)
            .reshape(B, N, self.num_heads, self.head_dim)
            .permute(0, 2, 1, 3)
        )
        if self.sr_ratio > 1:
            x_ = x.transpose(1, 2)
            x_ = self.sr(x_)
            x_ = self.norm(x_)
            x_ = x_.transpose(1, 2)
        else:
            x_ = x
        M = x_.shape[1]
        k = (
            self.k(x_)
            .reshape(B, M, self.num_heads, self.head_dim)
            .permute(0, 2, 1, 3)
        )
        v = (
            self.v(x_)
            .reshape(B, M, self.num_heads, self.head_dim)
            .permute(0, 2, 1, 3)
        )
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class NTB(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1, sr_ratio=1, head_dim=32,
                 mix_block_ratio=0.75, mlp_ratio=2.0, divisor=32):
        super().__init__()
        self.mhsa_out_channels = make_divisible(
            int(out_ch * mix_block_ratio), divisor
        )
        self.mhca_out_channels = out_ch - self.mhsa_out_channels
        self.patch_embed = PatchEmbed(in_ch, self.mhsa_out_channels, stride)
        self.norm1 = nn.BatchNorm2d(self.mhsa_out_channels)
        self.e_mhsa = E_MHSA(
            self.mhsa_out_channels, head_dim=head_dim, sr_ratio=sr_ratio
        )
        self.projection = PatchEmbed(
            self.mhsa_out_channels, self.mhca_out_channels, stride=1
        )
        self.mhca = MHCA(self.mhca_out_channels, head_dim)
        self.norm2 = nn.BatchNorm2d(out_ch)
        self.mlp = Mlp(out_ch, mlp_ratio, divisor)

    def forward(self, x):
        x = self.patch_embed(x)
        B, C, H, W = x.shape
        out = self.norm1(x)
        out = out.reshape(B, C, H * W).permute(0, 2, 1)
        out = self.e_mhsa(out)
        out = out.permute(0, 2, 1).reshape(B, C, H, W)
        x = x + out
        y = self.projection(x)
        y = y + self.mhca(y)
        z = torch.cat([x, y], dim=1)
        out = self.norm2(z)
        return z + self.mlp(out)


class NextViTTorch(nn.Module):
    """Flattened ``features`` list matching timm's hook indexing
    (reference backbones/next_vit.py:18-29 hooks model.features[i])."""

    def __init__(self, stem_chs, depths, strides, sr_ratios, head_dim,
                 mix_block_ratio=0.75, divisor=32, stage_out_channels=None):
        super().__init__()
        s0, s1, s2 = stem_chs
        self.stem = nn.Sequential(
            ConvBNReLU(3, s0, 3, 2),
            ConvBNReLU(s0, s1, 3, 1),
            ConvBNReLU(s1, s2, 3, 1),
            ConvBNReLU(s2, s2, 3, 2),
        )
        if stage_out_channels is None:
            d = depths
            stage_out_channels = [
                [96] * d[0],
                [192] * (d[1] - 1) + [256],
                [384, 384, 384, 384, 512] * (d[2] // 5),
                [768] * (d[3] - 1) + [1024],
            ]
        types = [
            ["ncb"] * depths[0],
            ["ncb"] * (depths[1] - 1) + ["ntb"],
            ["ncb", "ncb", "ncb", "ncb", "ntb"] * (depths[2] // 5),
            ["ncb"] * (depths[3] - 1) + ["ntb"],
        ]
        self.features = nn.ModuleList()
        in_ch = s2
        for s in range(4):
            for b in range(depths[s]):
                stride = 2 if (strides[s] == 2 and b == 0) else 1
                out_ch = stage_out_channels[s][b]
                if types[s][b] == "ntb":
                    blk = NTB(
                        in_ch, out_ch, stride=stride, sr_ratio=sr_ratios[s],
                        head_dim=head_dim, mix_block_ratio=mix_block_ratio,
                        divisor=divisor,
                    )
                else:
                    blk = NCB(
                        in_ch, out_ch, stride=stride, head_dim=head_dim,
                        divisor=divisor,
                    )
                self.features.append(blk)
                in_ch = out_ch

    def forward(self, x, hooks):
        x = self.stem(x)
        taps = []
        for i, blk in enumerate(self.features):
            x = blk(x)
            if i in hooks:
                taps.append(x)
        return taps
