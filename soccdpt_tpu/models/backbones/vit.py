"""ViT and BEiT backbones for DPT, flax-native.

Replaces the reference's timm wrappers + hook machinery
(reference backbones/vit.py:88-144, backbones/beit.py, hook tables
dpt.py:51-89). A plain single-scale transformer runs once; the
activations of four chosen blocks are lifted into a 4-level pyramid by
the MiDaS "act_postprocess" recipe (reference backbones/utils.py:154-269):

  level 1: readout -> 1x1 conv -> 4x conv-transpose   (stride 4)
  level 2: readout -> 1x1 conv -> 2x conv-transpose   (stride 8)
  level 3: readout -> 1x1 conv                        (stride 16)
  level 4: readout -> 1x1 conv -> 3x3 stride-2 conv   (stride 32)

Readout handles the cls token: "project" concatenates it to every patch
token through Linear(2C->C)+GELU (reference backbones/utils.py:5-40);
"ignore" drops it.

ViT: learned absolute pos-embed, bilinearly resized for the actual grid
(the reference's ``forward_flex``, vit.py:23-85). BEiT: no abs
pos-embed; per-block relative position bias over the actual grid
(+ cls-token rows) and LayerScale gamma — the reference monkey-patches
timm for non-square grids (beit.py:30-175); here the bias table is
simply built for the traced grid size.
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
class ViTConfig:
    img_size: int = 384
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    family: str = "vit"  # "vit" | "beit"
    readout: str = "project"  # "project" | "ignore"
    # pyramid channel widths (reference blocks.py:96-119 tables)
    post_channels: Tuple[int, int, int, int] = (96, 192, 384, 768)
    layer_scale_init: float = 0.1  # beit only


VIT_CONFIGS = {
    "vitb16_384": ViTConfig(),
    "vitl16_384": ViTConfig(
        embed_dim=1024, depth=24, num_heads=16,
        post_channels=(256, 512, 1024, 1024),
    ),
    "beitb16_384": ViTConfig(
        family="beit", post_channels=(96, 192, 384, 768)
    ),
    "beitl16_384": ViTConfig(
        family="beit", embed_dim=1024, depth=24, num_heads=16,
        post_channels=(256, 512, 1024, 1024),
    ),
    "beitl16_512": ViTConfig(
        family="beit", img_size=512, embed_dim=1024, depth=24, num_heads=16,
        post_channels=(256, 512, 1024, 1024),
    ),
    # Tiny config for unit tests
    "vittest_64": ViTConfig(
        img_size=64, patch_size=8, embed_dim=32, depth=4, num_heads=2,
        post_channels=(16, 32, 64, 128),
    ),
    "beittest_64": ViTConfig(
        family="beit", img_size=64, patch_size=8, embed_dim=32, depth=4,
        num_heads=2, post_channels=(16, 32, 64, 128),
    ),
}

# Hook indices (reference dpt.py:51-89).
VIT_HOOKS = {
    "vitb16_384": (2, 5, 8, 11),
    "vitl16_384": (5, 11, 17, 23),
    "beitb16_384": (2, 5, 8, 11),
    "beitl16_384": (5, 11, 17, 23),
    "beitl16_512": (5, 11, 17, 23),
    "vittest_64": (0, 1, 2, 3),
    "beittest_64": (0, 1, 2, 3),
}


@functools.lru_cache(maxsize=32)
def _beit_rel_pos_index(gh: int, gw: int) -> np.ndarray:
    """(1+N, 1+N) index into the rel-pos table incl. cls-token rows.

    Table layout follows timm BEiT exactly so pretrained tables import
    1:1: spatial entries 0..(2gh-1)(2gw-1)-1, then cls->token,
    token->cls, cls->cls as the last three rows."""
    num_rel = (2 * gh - 1) * (2 * gw - 1)
    coords = np.stack(np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += gh - 1
    rel[:, :, 1] += gw - 1
    rel[:, :, 0] *= 2 * gw - 1
    idx = np.zeros((gh * gw + 1, gh * gw + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel  # cls -> token
    idx[0:, 0] = num_rel + 1  # token -> cls
    idx[0, 0] = num_rel + 2  # cls -> cls
    return idx


class TransformerBlock(nn.Module):
    cfg: ViTConfig
    grid: Tuple[int, int]
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (B, 1+N, C) with cls token first."""
        cfg = self.cfg
        C = cfg.embed_dim
        H = cfg.num_heads
        hd = C // H
        B, T, _ = x.shape

        # timm builds ViT/BEiT with LayerNorm eps 1e-6 (unlike Swin's
        # 1e-5) — checkpoint parity requires matching it.
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        if cfg.family == "beit":
            # q/v bias only (k bias zero), like timm beit
            qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="qkv")(h)
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
            qkv = qkv + jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias]
            ).astype(qkv.dtype)
        else:
            qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, T, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        bias = None
        if cfg.family == "beit":
            gh, gw = self.grid
            num_rel = (2 * gh - 1) * (2 * gw - 1) + 3
            table = self.param(
                "rel_pos_table",
                nn.initializers.zeros,
                (num_rel, H),
            )

            def compute_bias():
                idx = jnp.asarray(_beit_rel_pos_index(gh, gw).reshape(-1))
                # jnp.asarray: params may be host numpy (structural_init)
                return (
                    jnp.asarray(table)[idx].reshape(T, T, H).transpose(2, 0, 1)
                )

            # Param-derived constant: at the 512-px grid this is a
            # million-row gather + 67 MB transpose PER BLOCK per
            # dispatch — the dominant cost of BEiT single-shot serving.
            # Folded at weight-bind time (models/bias_cache.py); keyed
            # by grid so a cache built at another resolution is ignored.
            bias = cached_bias(
                self, f"rel_bias_{gh}x{gw}", compute_bias
            )

        if self.use_pallas:
            # Fused flash attention: the (H, T, T) score matrix and the
            # rel-pos bias stay in VMEM instead of round-tripping HBM
            # every layer (ops/global_attention.py; PERF.md BEiT-512).
            import os

            from ...ops.global_attention import flash_mha

            out = flash_mha(
                q, k, v, bias, scale=hd**-0.5,
                interpret=jax.default_backend() != "tpu",
                # Pallas recompute backward by default (PERF.md round 5);
                # SOCCDPT_FLASH_BWD=xla selects the XLA-recompute VJP
                # (the comparison baseline).
                backward=os.environ.get("SOCCDPT_FLASH_BWD", "pallas"),
            ).astype(self.dtype)
        else:
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            if bias is not None:
                attn = attn + bias.astype(jnp.float32)[None]
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
            ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)

        if cfg.family == "beit":
            gamma1 = self.param(
                "gamma_1",
                lambda k, s: jnp.full(s, cfg.layer_scale_init, jnp.float32),
                (C,),
            )
            out = out * gamma1.astype(out.dtype)
        x = x + out

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(int(C * cfg.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        if cfg.family == "beit":
            gamma2 = self.param(
                "gamma_2",
                lambda k, s: jnp.full(s, cfg.layer_scale_init, jnp.float32),
                (C,),
            )
            h = h * gamma2.astype(h.dtype)
        return x + h


class Readout(nn.Module):
    """cls-token readout (reference backbones/utils.py:5-40)."""

    mode: str
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, 1+N, C) -> (B, N, C)."""
        cls, patches = tokens[:, :1], tokens[:, 1:]
        if self.mode == "ignore":
            return patches
        readout = jnp.broadcast_to(cls, patches.shape)
        x = jnp.concatenate([patches, readout], axis=-1)
        x = nn.Dense(self.dim, dtype=self.dtype, name="project")(x)
        return nn.gelu(x, approximate=False)


class ViTBackbone(nn.Module):
    """Single-scale ViT/BEiT encoder -> 4-level pyramid (NHWC)."""

    cfg: ViTConfig
    hooks: Tuple[int, int, int, int]
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        B, H, W, _ = x.shape
        p = cfg.patch_size
        assert H % p == 0 and W % p == 0
        gh, gw = H // p, W // p
        C = cfg.embed_dim

        x = nn.Conv(
            C, (p, p), strides=(p, p), dtype=self.dtype, name="patch_embed"
        )(x)
        tokens = x.reshape(B, gh * gw, C)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, C))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (B, 1, C)), tokens], axis=1
        )

        if cfg.family == "vit":
            # learned pos-embed at the pretrain grid, bilinearly resized to
            # the runtime grid (reference forward_flex, vit.py:23-85)
            g0 = cfg.img_size // p
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, 1 + g0 * g0, C),
            )
            cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
            if (gh, gw) != (g0, g0):
                from ...ops.resize import resize_hw

                patch_pos = resize_hw(
                    patch_pos.reshape(1, g0, g0, C), (gh, gw), "bilinear", False
                ).reshape(1, gh * gw, C)
            tokens = tokens + jnp.concatenate(
                [cls_pos, patch_pos], axis=1
            ).astype(tokens.dtype)

        feats = []
        for i in range(cfg.depth):
            tokens = TransformerBlock(
                cfg=cfg, grid=(gh, gw), dtype=self.dtype,
                use_pallas=self.use_pallas, name=f"block{i}"
            )(tokens, deterministic=deterministic)
            if i in self.hooks:
                feats.append(tokens)
        assert len(feats) == 4, (self.hooks, cfg.depth)

        # act_postprocess pyramid (reference backbones/utils.py:154-269)
        outs = []
        for lvl, tok in enumerate(feats):
            h = Readout(
                mode=cfg.readout, dim=C, dtype=self.dtype,
                name=f"readout{lvl + 1}",
            )(tok)
            h = h.reshape(B, gh, gw, C)
            ch = cfg.post_channels[lvl]
            h = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"proj{lvl + 1}")(h)
            if lvl == 0:
                h = nn.ConvTranspose(
                    ch, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="up4x",
                )(h)
            elif lvl == 1:
                h = nn.ConvTranspose(
                    ch, (2, 2), strides=(2, 2), dtype=self.dtype,
                    name="up2x",
                )(h)
            elif lvl == 3:
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="down2x",
                )(h)
            outs.append(h)
        return tuple(outs)


def make_vit_backbone(
    backbone: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Dtype = jnp.float32,
    use_pallas: Optional[bool] = None,
):
    cfg = VIT_CONFIGS[backbone]
    hooks = tuple(hooks) if hooks is not None else VIT_HOOKS[backbone]
    if use_pallas is None:
        # Measured on v5e (PERF.md): flash attention is 3.2-6.1x for the
        # BEiT family (bias re-reads + score round-trips dominate) but
        # 0.8x for plain ViT (no bias; cls-token padding overhead), so
        # BEiT defaults to the kernel on TPU and ViT to XLA.
        import jax

        use_pallas = cfg.family == "beit" and jax.default_backend() == "tpu"
    factory = functools.partial(
        ViTBackbone, cfg=cfg, hooks=hooks, dtype=dtype, use_pallas=use_pallas
    )
    return factory, cfg.post_channels
