"""Output heads for the DPT trunk (NHWC).

Depth head: reference dpt.py:199-219 (conv3x3 -> 2x bilinear ac=True ->
conv3x3 -> relu -> conv1x1 -> relu). Seg head: reference dpt.py:242-252 /
SOccDPT.py:660-674 (conv3x3+BN+relu+dropout -> conv1x1 -> 2x up ->
sigmoid-or-scaled-tanh).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import upsample2x_hw

Dtype = Any


def scaled_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * tanh(x) + 0.5 (reference scaled_tanh.py:4-10)."""
    return 0.5 * jnp.tanh(x) + 0.5


class DepthHead(nn.Module):
    head_features_1: int = 256
    head_features_2: int = 32
    non_negative: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, H, W, F) -> (B, 2H, 2W, 1) inverse depth."""
        x = nn.Conv(
            self.head_features_1 // 2,
            (3, 3),
            padding=1,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = upsample2x_hw(x, "bilinear", align_corners=True)
        x = nn.Conv(
            self.head_features_2, (3, 3), padding=1, dtype=self.dtype, name="conv2"
        )(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv3")(x)
        if self.non_negative:
            x = nn.relu(x)
        return x


class SegHead(nn.Module):
    num_classes: int = 3
    features: int = 256
    sigmoid: bool = True  # False -> scaled tanh (reference SOccDPT.py:655-658)
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, H, W, F) -> (B, 2H, 2W, C) per-class mask probabilities."""
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic,
            momentum=0.9,
            dtype=jnp.float32,
            name="bn",
        )(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv2")(x)
        x = upsample2x_hw(x, "bilinear", align_corners=True)
        if self.sigmoid:
            return nn.sigmoid(x)
        return scaled_tanh(x)


class IdentityHead(nn.Module):
    """Pass-through head (SOccDPT V2's shared trunk, reference
    SOccDPT.py:534-536)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return x


class OccupancyHead(nn.Module):
    """3D-conv occupancy refiner. The reference declares this network but
    ships ``nn.Identity`` (commented out at SOccDPT.py:231-245); here it
    is real, per SURVEY.md §3.4's note to "make this head real".

    Input/output: (B, X, Y, Z, C) occupancy logits -> probabilities.
    """

    num_classes: int = 3
    identity: bool = True  # reference-faithful default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.identity:
            return g
        x = nn.Conv(8, (3, 3, 3), padding=1, dtype=self.dtype, name="conv1")(g)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = nn.Conv(16, (3, 3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = nn.Conv(32, (3, 3, 3), padding=1, dtype=self.dtype, name="conv3")(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.num_classes, (3, 3, 3), padding=1, dtype=self.dtype, name="conv4"
        )(x)
        # Loss-facing logits in f32: a bf16 sigmoid quantizes probabilities
        # to ~2^-9 steps around 0.5, which staircases the BCE loss.
        x = x.astype(jnp.float32)
        # Trilinear upsample back to the full grid.
        from ..ops.resize import resize_hw

        B, X, Y, Z, C = x.shape
        gx, gy, gz = g.shape[1:4]
        x = resize_hw(x.reshape(B, X, Y, Z * C), (gx, gy), "bilinear").reshape(
            B, gx, gy, Z, C
        )
        x = resize_hw(
            x.transpose(0, 3, 1, 2, 4).reshape(B, Z, gx, gy * C),
            (gz, gx),
            "bilinear",
        ).reshape(B, gz, gx, gy, C).transpose(0, 2, 3, 1, 4)
        return nn.sigmoid(x)
