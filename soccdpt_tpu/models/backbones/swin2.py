"""Swin Transformer V2 backbone, TPU-native flax implementation.

Functionally replaces the reference's timm-wrapper-plus-forward-hooks
machinery (reference backbones/swin2.py:24-30, swin_common.py:12-54,
backbones/utils.py:54-61): instead of mutating a global ``activations``
dict from hooks, ``__call__`` returns the four stage feature maps
directly, NHWC.

The computation matches timm's ``SwinTransformerV2`` exactly (post-norm
blocks, scaled-cosine attention with a learned per-head logit scale,
log-spaced continuous relative position bias MLP, patch-merging with
reduction-then-norm) so that torch checkpoints trained by the reference
import 1:1 (see core/torch_import.py). "Hook" indices follow the
reference's table (dpt.py:51-89): the feature for stage *i* is the
output of ``blocks[hooks[i]]`` at that stage's resolution, taken before
downsampling.

The attention inner loop has two interchangeable implementations:
plain XLA einsum (default, used for correctness) and a Pallas
windowed-attention kernel (ops/window_attention.py) enabled via
``use_pallas=True``.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..bias_cache import cached_bias

Dtype = Any


@dataclass(frozen=True)
class SwinV2Config:
    img_size: int = 256
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 16
    pretrained_window_sizes: Tuple[int, ...] = (0, 0, 0, 0)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1

    @property
    def patch_grid(self) -> Tuple[int, int]:
        g = self.img_size // self.patch_size
        return (g, g)

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2**i) for i in range(len(self.depths)))


# Backbone name -> config; names follow the reference's encoder factory
# (reference blocks.py:64-78, swin2.py:6-30).
SWIN2_CONFIGS = {
    "swin2t16_256": SwinV2Config(
        img_size=256, embed_dim=96, depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24), window_size=16,
    ),
    "swin2b24_384": SwinV2Config(
        img_size=384, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), window_size=24,
        pretrained_window_sizes=(12, 12, 12, 6),
    ),
    "swin2l24_384": SwinV2Config(
        img_size=384, embed_dim=192, depths=(2, 2, 18, 2),
        num_heads=(6, 12, 24, 48), window_size=24,
        pretrained_window_sizes=(12, 12, 12, 6),
    ),
    # Tiny config for fast unit tests on CPU (no reference equivalent).
    "swin2test_64": SwinV2Config(
        img_size=64, embed_dim=16, depths=(2, 2, 2, 2),
        num_heads=(1, 2, 4, 8), window_size=4,
    ),
}

# Default hook indices per backbone (reference dpt.py:51-89).
SWIN2_HOOKS = {
    "swin2t16_256": (1, 1, 5, 1),
    "swin2b24_384": (1, 1, 17, 1),
    "swin2l24_384": (1, 1, 17, 1),
    "swin2test_64": (1, 1, 1, 1),
}


# ---------------------------------------------------------------------------
# Static tables (host-side numpy, cached per window geometry)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def relative_position_index(
    wh: int, ww: int, table_wh: Optional[int] = None, table_ww: Optional[int] = None
) -> np.ndarray:
    """(wh*ww, wh*ww) index into a (2table_wh-1)(2table_ww-1) relative-
    bias table (table window defaults to the effective window).

    Passing a larger table window lets a resolution-clamped effective
    window index into the checkpoint-shaped table — the param shape must
    not depend on the input size (timm sizes the V1 table by the
    constructed window)."""
    table_wh = wh if table_wh is None else table_wh
    table_ww = ww if table_ww is None else table_ww
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    )  # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += table_wh - 1
    rel[:, :, 1] += table_ww - 1
    rel[:, :, 0] *= 2 * table_ww - 1
    return rel.sum(-1)  # (N, N)


@functools.lru_cache(maxsize=64)
def _toeplitz_selectors(
    wh: int, ww: int, table_wh: int, table_ww: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Static one-hot selectors expanding a relative-bias table to the
    (N, N) bias matrix WITHOUT a gather: the matrix is 2-D
    block-Toeplitz (bias[(py,px),(qy,qx)] = table2d[py-qy, px-qx]), so
    the expansion is two tiny einsums whose backward is matmuls. The
    gather formulation's transpose is a 65536-row scatter-add that
    costs 445 us/block on v5e (2.7 ms/step over the six flagship
    blocks); one-hot matmuls are EXACT at any TPU precision (each
    product multiplies by 0/1, each output sums one nonzero)."""
    ay = np.arange(wh)
    ey = (
        ay[:, None, None] - ay[None, :, None] + (table_wh - 1)
        == np.arange(2 * table_wh - 1)[None, None, :]
    ).astype(np.float32)  # (wh, wh, 2*table_wh-1)
    ax = np.arange(ww)
    ex = (
        ax[:, None, None] - ax[None, :, None] + (table_ww - 1)
        == np.arange(2 * table_ww - 1)[None, None, :]
    ).astype(np.float32)  # (ww, ww, 2*table_ww-1)
    return ey, ex


def toeplitz_bias_expand(
    cpb: jnp.ndarray,
    wh: int,
    ww: int,
    table_wh: Optional[int] = None,
    table_ww: Optional[int] = None,
) -> jnp.ndarray:
    """((2tWh-1)(2tWw-1), H) table -> (H, wh*ww, wh*ww) bias matrix;
    exactly ``cpb[relative_position_index(wh, ww, tWh, tWw)]`` but
    scatter-free in the backward (see _toeplitz_selectors)."""
    table_wh = wh if table_wh is None else table_wh
    table_ww = ww if table_ww is None else table_ww
    H = cpb.shape[-1]
    cpb2 = cpb.reshape(2 * table_wh - 1, 2 * table_ww - 1, H)
    ey, ex = _toeplitz_selectors(wh, ww, table_wh, table_ww)
    t1 = jnp.einsum("pqa,abh->pqbh", jnp.asarray(ey, cpb.dtype), cpb2)
    rb = jnp.einsum("PQb,pqbh->hpPqQ", jnp.asarray(ex, cpb.dtype), t1)
    return rb.reshape(H, wh * ww, wh * ww)


@functools.lru_cache(maxsize=64)
def relative_coords_table(
    wh: int, ww: int, pretrained_wh: int, pretrained_ww: int
) -> np.ndarray:
    """Log-spaced normalized relative coordinates, ((2wh-1)*(2ww-1), 2)."""
    h = np.arange(-(wh - 1), wh, dtype=np.float64)
    w = np.arange(-(ww - 1), ww, dtype=np.float64)
    table = np.stack(np.meshgrid(h, w, indexing="ij"), axis=-1)  # (2wh-1, 2ww-1, 2)
    if pretrained_wh > 0:
        table[..., 0] /= pretrained_wh - 1
        table[..., 1] /= pretrained_ww - 1
    else:
        table[..., 0] /= max(wh - 1, 1)
        table[..., 1] /= max(ww - 1, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2).astype(np.float32)


@functools.lru_cache(maxsize=64)
def shifted_window_attn_mask(
    H: int,
    W: int,
    wh: int,
    ww: int,
    sh: int,
    sw: int,
    Hp: Optional[int] = None,
    Wp: Optional[int] = None,
) -> Optional[np.ndarray]:
    """(num_windows, N, N) additive mask (0 / -100) for SW-MSA.

    When (Hp, Wp) exceed (H, W) the input is zero-padded to window
    multiples (timm behavior for non-divisible grids, e.g. the 384-px
    Swin2 models fed 256-px inputs — reference loader.py:179-212);
    padded tokens get their own region so real tokens never attend to
    them.
    """
    Hp = Hp if Hp is not None else H
    Wp = Wp if Wp is not None else W
    if sh == 0 and sw == 0 and Hp == H and Wp == W:
        return None
    img_mask = np.zeros((Hp, Wp), dtype=np.int32)
    if sh > 0 or sw > 0:
        cnt = 0
        for hs in (slice(0, Hp - wh), slice(Hp - wh, Hp - sh), slice(Hp - sh, Hp)):
            for ws in (slice(0, Wp - ww), slice(Wp - ww, Wp - sw), slice(Wp - sw, Wp)):
                img_mask[hs, ws] = cnt
                cnt += 1
    if Hp > H:
        img_mask[H:, :] = -1
    if Wp > W:
        img_mask[:, W:] = -1
    mw = img_mask.reshape(Hp // wh, wh, Wp // ww, ww)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, wh * ww)  # (nW, N)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Window partition helpers (NHWC)
# ---------------------------------------------------------------------------


def window_partition(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, wh * ww, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(win: jnp.ndarray, wh: int, ww: int, H: int, W: int) -> jnp.ndarray:
    """(B * nH * nW, wh * ww, C) -> (B, H, W, C)."""
    C = win.shape[-1]
    B = win.shape[0] // ((H // wh) * (W // ww))
    x = win.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def drop_path(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Per-sample stochastic depth."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class WindowAttentionV2(nn.Module):
    """Scaled-cosine window attention with continuous rel-pos bias."""

    dim: int
    num_heads: int
    window: Tuple[int, int]
    pretrained_window: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """x: (num_windows_total, N, C); mask: (nW, N, N) or None."""
        Bw, N, C = x.shape
        H = self.num_heads
        hd = C // H

        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="qkv")(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
        bias = jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]
        ).astype(qkv.dtype)
        qkv = qkv + bias
        qkv = qkv.reshape(Bw, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (Bw, H, N, hd)

        # Learned per-head temperature, clamped like timm (max log(100)).
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, float(np.log(10.0))),
            (H, 1, 1),
        )
        scale = jnp.exp(
            jnp.minimum(logit_scale, float(np.log(100.0)))
        ).astype(self.dtype)

        # Continuous relative position bias: 2-layer MLP on the static
        # log-spaced coords table, gathered by relative position index.
        # The MLP params must exist unconditionally (importer layout),
        # so the Dense modules are declared outside the cached branch.
        cpb_mlp_0 = nn.Dense(512, dtype=jnp.float32, name="cpb_mlp_0")
        cpb_mlp_1 = nn.Dense(
            H, use_bias=False, dtype=jnp.float32, name="cpb_mlp_1"
        )

        def compute_rel_bias():
            table = jnp.asarray(
                relative_coords_table(*self.window, *self.pretrained_window)
            )
            cpb = cpb_mlp_1(nn.relu(cpb_mlp_0(table)))  # (M, H)
            # Toeplitz expansion instead of cpb[rel_index]: same values,
            # but the backward is matmuls instead of a 65536-row
            # scatter-add (445 us/block on v5e in the train step).
            rb = toeplitz_bias_expand(cpb, *self.window)  # (H, N, N)
            return (16.0 * jax.nn.sigmoid(rb)).astype(self.dtype)

        # Param-derived constant: the gather runs at <60 GB/s on TPU and
        # dominates single-dispatch latency — fold it at weight-bind time
        # (models/bias_cache.py). Keyed by the effective (resolution-
        # clipped) window so a cache built at one input size is ignored
        # at another rather than served with the wrong shape.
        rel_bias = cached_bias(
            self,
            f"rel_bias_{self.window[0]}x{self.window[1]}",
            compute_rel_bias,
        )

        qn = q / jnp.maximum(
            jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True),
            1e-12,
        ).astype(self.dtype)
        kn = k / jnp.maximum(
            jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True),
            1e-12,
        ).astype(self.dtype)

        if self.use_pallas:
            from ...ops.window_attention import pallas_window_attention

            out = pallas_window_attention(
                qn,
                kn,
                v,
                scale,
                rel_bias,
                mask=mask,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", qn, kn, preferred_element_type=jnp.float32
            )
            attn = attn * scale.astype(jnp.float32)
            attn = attn + rel_bias.astype(jnp.float32)[None]
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


class SwinV2Block(nn.Module):
    """Post-norm Swin V2 block: x + norm(attn(x)); x + norm(mlp(x))."""

    dim: int
    num_heads: int
    input_resolution: Tuple[int, int]
    window_size: int
    shift: bool
    pretrained_window_size: int
    mlp_ratio: float
    drop_path_rate: float
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        Hr, Wr = self.input_resolution
        # timm clamps window to the input resolution and disables the
        # shift when a single window covers the stage.
        ws = min(self.window_size, Hr, Wr)
        shift = ws // 2 if (self.shift and ws < min(Hr, Wr)) else 0
        # timm keeps pretrained_window_size unchanged even when the
        # window is resolution-clamped (SwinTransformerV2Block passes it
        # straight to WindowAttention) — zeroing it here would change the
        # CPB coords normalization for e.g. swin2b24_384 stage 3
        # (grid 12 < window 24, pretrained 6) and break checkpoint
        # parity. Caught by the whole-backbone HF parity test.
        pws = self.pretrained_window_size

        Hp = -(-Hr // ws) * ws
        Wp = -(-Wr // ws) * ws

        shortcut = x
        h = x
        if (Hp, Wp) != (Hr, Wr):
            h = jnp.pad(h, ((0, 0), (0, Hp - Hr), (0, Wp - Wr), (0, 0)))
        if shift > 0:
            h = jnp.roll(h, shift=(-shift, -shift), axis=(1, 2))
        if (
            os.environ.get("SOCCDPT_ISOLATE_RETILE", "0") == "1"
            and (Hp > ws or Wp > ws)
        ):
            # Experiment (PERF.md round 5, "remaining serving lever"):
            # keep the window re-tiling transpose out of the producing
            # mlp_fc2 matmul's fusion — the fused form runs the matmul
            # at 6% of peak, bandwidth-bound on the re-tiling.
            h = jax.lax.optimization_barrier(h)
        win = window_partition(h, ws, ws)
        mask_np = shifted_window_attn_mask(Hr, Wr, ws, ws, shift, shift, Hp, Wp)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        win = WindowAttentionV2(
            dim=self.dim,
            num_heads=self.num_heads,
            window=(ws, ws),
            pretrained_window=(pws, pws),
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="attn",
        )(win, mask)
        h = window_reverse(win, ws, ws, Hp, Wp)
        if shift > 0:
            h = jnp.roll(h, shift=(shift, shift), axis=(1, 2))
        if (Hp, Wp) != (Hr, Wr):
            h = h[:, :Hr, :Wr]
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(h).astype(self.dtype)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        x = shortcut + drop_path(h, self.drop_path_rate, deterministic, rng)

        h = nn.Dense(
            int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1"
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(h).astype(self.dtype)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        return x + drop_path(h, self.drop_path_rate, deterministic, rng)


class PatchMerging(nn.Module):
    """2x2 spatial merge: concat -> Linear(4C, 2C) -> LayerNorm (v2 order)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)  # timm concat order
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)


class SwinV2Backbone(nn.Module):
    """Four-stage Swin V2 encoder returning hooked stage features (NHWC).

    Output channel widths for swin2t16_256: (96, 192, 384, 768) at
    strides (4, 8, 16, 32) — reference blocks.py:74-78.

    ``remat``: rematerialize each block's activations on the backward
    pass (jax.checkpoint) — combined with the patchwise stop_gradient
    masks this bounds training HBM (SURVEY.md §7.3 risk 3, the
    memory-intent of the reference's PatchWise scheme).
    """

    cfg: SwinV2Config
    hooks: Tuple[int, int, int, int] = (1, 1, 5, 1)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        B, H, W, _ = x.shape
        assert H % cfg.patch_size == 0 and W % cfg.patch_size == 0, (
            f"input {H}x{W} not divisible by patch size {cfg.patch_size}"
        )
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x).astype(
            self.dtype
        )

        grid = (H // cfg.patch_size, W // cfg.patch_size)
        total_depth = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_depth)
        feats = []
        blk_id = 0
        block_cls = (
            nn.remat(SwinV2Block, static_argnums=(2,))
            if self.remat
            else SwinV2Block
        )
        for i, depth in enumerate(cfg.depths):
            res = (grid[0] >> i, grid[1] >> i)
            dim = cfg.stage_dims[i]
            captured = None
            for j in range(depth):
                x = block_cls(
                    dim=dim,
                    num_heads=cfg.num_heads[i],
                    input_resolution=res,
                    window_size=cfg.window_size,
                    shift=(j % 2 == 1),
                    pretrained_window_size=cfg.pretrained_window_sizes[i],
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path_rate=float(dpr[blk_id]),
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name=f"stage{i}_block{j}",
                )(x, deterministic)
                blk_id += 1
                if j == self.hooks[i]:
                    captured = x
            assert captured is not None, (
                f"hook {self.hooks[i]} out of range for stage {i} "
                f"(depth {depth})"
            )
            feats.append(captured)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(dtype=self.dtype, name=f"downsample{i}")(x)
        return tuple(feats)


def make_swin2_backbone(
    backbone: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Dtype = jnp.float32,
    use_pallas: bool = False,
    remat: bool = False,
):
    """Factory mirroring reference ``_make_pretrained_swin2*`` +
    ``_make_encoder`` channel tables (reference blocks.py:64-78).
    Returns (module factory, stage channel widths)."""
    import functools

    cfg = SWIN2_CONFIGS[backbone]
    hooks = tuple(hooks) if hooks is not None else SWIN2_HOOKS[backbone]
    factory = functools.partial(
        SwinV2Backbone,
        cfg=cfg,
        hooks=hooks,
        dtype=dtype,
        use_pallas=use_pallas,
        remat=remat,
    )
    return factory, cfg.stage_dims
