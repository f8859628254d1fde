"""ViT3D: volumetric transformer over the occupancy grid.

The reference ships this as dead code — a standalone video/volume ViT
whose import is commented out, intended for occupancy-grid refinement
(reference backbones/vit_3d.py:109-193, SOccDPT.py:13,368). Here it is a
working flax module usable as an alternative occupancy refiner to the
3D-CNN ``OccupancyHead``: the (gx, gy, gz, C) grid is cut into 3D
patches, embedded, run through a small transformer with a cls token,
and either classified (reference behavior) or decoded back to a refined
grid (``mode="refine"``).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ViT3D(nn.Module):
    patch_size: Tuple[int, int, int] = (16, 16, 8)
    embed_dim: int = 256
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_classes: int = 3
    mode: str = "refine"  # "refine" -> grid out; "classify" -> logits out
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, grid: jnp.ndarray, deterministic: bool = True):
        """grid: (B, gx, gy, gz, C)."""
        B, gx, gy, gz, C = grid.shape
        px, py, pz = self.patch_size
        assert gx % px == 0 and gy % py == 0 and gz % pz == 0
        nx, ny, nz = gx // px, gy // py, gz // pz
        n_tokens = nx * ny * nz

        # 3D patchify via conv
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(px, py, pz),
            strides=(px, py, pz),
            dtype=self.dtype,
            name="patch_embed",
        )(grid.astype(self.dtype))
        x = x.reshape(B, n_tokens, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_tokens + 1, self.embed_dim),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, self.embed_dim)), x],
            axis=1,
        )
        x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm1_{i}")(x).astype(
                self.dtype
            )
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype, name=f"attn_{i}"
            )(h, h)
            x = x + h
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm2_{i}")(x).astype(
                self.dtype
            )
            h = nn.Dense(
                int(self.embed_dim * self.mlp_ratio),
                dtype=self.dtype,
                name=f"mlp1_{i}",
            )(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.embed_dim, dtype=self.dtype, name=f"mlp2_{i}")(h)
            x = x + h

        if self.mode == "classify":
            cls_out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="head_norm")(x[:, 0])
            return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
                cls_out
            )

        # refine: project tokens back into per-voxel class residuals
        tok = x[:, 1:]
        voxels = nn.Dense(
            px * py * pz * self.num_classes, dtype=self.dtype, name="unpatch"
        )(tok)
        voxels = voxels.reshape(B, nx, ny, nz, px, py, pz, self.num_classes)
        voxels = voxels.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            B, gx, gy, gz, self.num_classes
        )
        return nn.sigmoid(grid.astype(jnp.float32) + voxels.astype(jnp.float32))
