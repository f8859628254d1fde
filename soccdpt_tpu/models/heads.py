"""Output heads for the DPT trunk (NHWC).

Depth head: reference dpt.py:199-219 (conv3x3 -> 2x bilinear ac=True ->
conv3x3 -> relu -> conv1x1 -> relu). Seg head: reference dpt.py:242-252 /
SOccDPT.py:660-674 (conv3x3+BN+relu+dropout -> conv1x1 -> 2x up ->
sigmoid-or-scaled-tanh).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import upsample2x_hw

Dtype = Any


def scaled_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * tanh(x) + 0.5 (reference scaled_tanh.py:4-10)."""
    return 0.5 * jnp.tanh(x) + 0.5


def _shifted_upsample_stack(in_size: int, out_size: int):
    """(3, out_size, in_size) f32: slice d is the align-corners-True
    bilinear upsample matrix with rows shifted by d-1 (zero rows past
    the boundary — SAME zero padding of the commuted conv)."""
    import numpy as np

    from ..ops.resize import _resize_matrix

    u = _resize_matrix(in_size, out_size, "bilinear", True)
    stack = np.zeros((3, out_size, in_size), np.float32)
    for d in range(3):
        s = d - 1
        src_lo, src_hi = max(0, s), min(out_size, out_size + s)
        stack[d, src_lo - s : src_hi - s] = u[src_lo:src_hi]
    return stack


class _UpConv(nn.Module):
    """conv3x3(upsample2x(x)) evaluated EXACTLY as shifted-resize
    matmuls at the coarse resolution.

    The serving profile (PERF.md round 5) measured the naive order —
    2x bilinear upsample then a 3x3 conv to 32 channels at 256^2 — at
    ~185 us: the conv fills only 32 of the MXU's 128 output lanes (24%
    of peak, a structural property of the arithmetic at fine grid) and
    XLA adds a 67 us relayout around it. Since the upsample is already
    a pair of resize MATMULS (ops/resize.py), the conv commutes through
    it term-by-term: conv(U x)[i] = sum_d k_d (S^{d-1} U x)[i], so the
    whole op is one (Cin -> 9*Cout) channel matmul at the COARSE grid
    followed by two (3*size -> 2*size) contractions with row-shifted
    upsample matrices — every term a full-lane MXU matmul, no fine-grid
    32-channel conv, no relayout. Same floats up to summation order
    (oracle-tested vs the naive path and the reference's torch head).

    Param tree is identical to ``nn.Conv(features, (3, 3))`` — kernel
    (3, 3, Cin, Cout) + bias — so checkpoints/importers are unchanged.
    """

    features: int
    dtype: Dtype = jnp.float32
    fused: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if not self.fused:
            y = upsample2x_hw(x, "bilinear", align_corners=True)
            y = jax.lax.conv_general_dilated(
                y.astype(self.dtype),
                kernel.astype(self.dtype),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        B, h, w, _ = x.shape
        k = kernel.astype(self.dtype)
        # (B,h,w,Cin) @ (Cin, 3*3*Cout): one channel matmul, coarse grid
        y = x.astype(self.dtype) @ k.transpose(2, 0, 1, 3).reshape(
            cin, 9 * self.features
        )
        y = y.reshape(B, h, w, 3, 3, self.features)
        mw = jnp.asarray(_shifted_upsample_stack(w, 2 * w), self.dtype)
        mh = jnp.asarray(_shifted_upsample_stack(h, 2 * h), self.dtype)
        # contract (dw, w) then (dh, h): shifted upsample columns
        z = jnp.einsum("bhwuvf,vWw->bhWuf", y, mw)
        out = jnp.einsum("bhWuf,uHh->bHWf", z, mh)
        return out + bias.astype(self.dtype)


class DepthHead(nn.Module):
    head_features_1: int = 256
    head_features_2: int = 32
    non_negative: bool = True
    dtype: Dtype = jnp.float32
    fused_upconv: bool = True  # exact rewrite; see _UpConv

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
        x = _UpConv(
            self.head_features_2,
            dtype=self.dtype,
            fused=self.fused_upconv,
            name="conv2",
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


class _Conv3DFolded(nn.Module):
    """A (3,3,3) 3-D conv evaluated as one dense MXU-shaped 2-D conv.

    XLA lowers small-channel 3-D convolutions on TPU as bandwidth-bound
    loop fusions: the per-HLO profile of the occupancy train step
    measured ONE backward conv of the old ``nn.Conv(8, (3,3,3))`` at
    24 ms running at 1.8 GB/s (PERF.md, occ-train attribution). Folding
    the depth axis into channels turns the same contraction into a (3,3)
    2-D conv with Z*Cin -> Z*Cout channels whose weight is block-banded
    in Z — built on the fly from the UNCHANGED (3,3,3,Cin,Cout) kernel
    parameter, so checkpoints, importers, and init stay byte-identical.
    The dense Z x Z mixing spends ~10x the minimal FLOPs, but they run
    on the MXU instead of as serial window loops; the zero blocks
    contribute exact zeros, so the output equals the 3-D conv up to
    f32/bf16 reduction order (equivalence-tested in
    tests/test_models.py::test_occupancy_head_folded_matches_conv3d).
    """

    features: int
    depth: int  # Z of the (B, X, Y, Z*Cin) depth-folded input
    split_pairs: bool = False  # emit (z-parity, z//2, c) channel order
    fold_in: str = "zc"  # input channel order: z*Cin+c ("zc") or c*Z+z ("cz")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        zc = x.shape[-1]
        z_dim, cout = self.depth, self.features
        cin = zc // z_dim
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, cin, cout),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        # Band selector: a SAME-padded kernel-3 conv reads input plane
        # z = zp + k - 1 for output plane zp at kernel offset k; out-of-
        # range planes fall outside the selector and become zero blocks,
        # which IS the zero padding.
        z = jnp.arange(z_dim)
        if self.split_pairs:
            # Output channel order (r, q, o) with plane p = 2q + r: the
            # following (2,2,2) max pool then splits channels at the
            # lane-aligned midpoint Z/2*cout instead of interleaving
            # 2*cout-wide pairs — the interleaved reshape-max ran its
            # eq/div/broadcast backward at 20-30 GB/s (minor dim 8).
            p_order = jnp.concatenate(
                [jnp.arange(0, z_dim, 2), jnp.arange(1, z_dim, 2)]
            )
        else:
            p_order = z
        sel = (
            z[None, :, None]
            == p_order[None, None, :] + jnp.arange(3)[:, None, None] - 1
        ).astype(self.dtype)
        # fold_in="cz": the voxelizer hands the grid over in its native
        # channel-minor order (c*Z + z) so no minor-3 relayout happens
        # between the Pallas kernel and this conv; the weight rows are
        # permuted to match instead (free — built from the tiny kernel).
        spec = "kzp,hwkio->hwzipo" if self.fold_in == "zc" else "kzp,hwkio->hwizpo"
        w2 = jnp.einsum(spec, sel, kernel.astype(self.dtype)).reshape(
            3, 3, z_dim * cin, z_dim * cout
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w2,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + jnp.tile(bias.astype(self.dtype), z_dim)


def _max_pool_222_split(x: jnp.ndarray) -> jnp.ndarray:
    """Non-overlapping (2,2,2) max pool on the depth-folded layout whose
    channels are in (z-parity, z//2, c) order (``split_pairs=True``).

    reshape+max instead of ``nn.max_pool``'s reduce_window: the 3-D
    select_and_scatter backward was measured at ~8 ms/step in the occ
    train profile, while max over reshaped axes differentiates as cheap
    select fusions. The parity-major channel order keeps the reduced
    minor dim at Z/2*C (lane-sized) rather than C.
    Output channels come out in standard (z', c) order.
    """
    b, xx, yy, k = x.shape
    # Pairwise jnp.maximum instead of one max-reduce: the reduce's VJP
    # tie-splits via eq/sum/div passes (measured 1.5 ms at 32 GB/s);
    # maximum's VJP is a single select. Values are identical (max is
    # associative); the z-pair halves split at the lane-aligned k//2.
    x = jnp.maximum(x[..., : k // 2], x[..., k // 2 :])
    x = x.reshape(b, xx, yy // 2, 2, k // 2)
    x = jnp.maximum(x[:, :, :, 0], x[:, :, :, 1])
    x = x.reshape(b, xx // 2, 2, yy // 2, k // 2)
    return jnp.maximum(x[:, :, 0], x[:, :, 1])


class OccupancyHead(nn.Module):
    """3D-conv occupancy refiner. The reference declares this network but
    ships ``nn.Identity`` (commented out at SOccDPT.py:231-245); here it
    is real, per SURVEY.md §3.4's note to "make this head real".

    Input/output: (B, X, Y, Z, C) occupancy logits -> probabilities.
    A 4-D input (B, X, Y, C*Z) is accepted as the voxelizer's native
    channel-minor folded layout (``grid_layout="folded_cz"`` in
    ``ops/geometry.py``) — it skips the minor-3 relayout between the
    Pallas segment-sum and conv1 (measured ~3.2 ms/step of
    convert_element_type data formatting in the occ-train profile).
    Compute path is depth-folded 2-D convs (see ``_Conv3DFolded``); the
    parameter tree is plain (3,3,3) conv kernels, unchanged.
    """

    num_classes: int = 3
    identity: bool = True  # reference-faithful default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.identity:
            return g
        if g.ndim == 4:  # (B, X, Y, C*Z) folded, channel-major c*Z+z
            b, gx, gy, zc = g.shape
            c = self.num_classes
            gz = zc // c
            x = g.astype(self.dtype)
            fold_in = "cz"
        else:
            b, gx, gy, gz, c = g.shape
            x = g.reshape(b, gx, gy, gz * c).astype(self.dtype)
            fold_in = "zc"
        z = gz
        x = nn.relu(
            _Conv3DFolded(
                8,
                depth=z,
                split_pairs=True,
                fold_in=fold_in,
                dtype=self.dtype,
                name="conv1",
            )(x)
        )
        x = _max_pool_222_split(x)
        z //= 2
        x = nn.relu(
            _Conv3DFolded(
                16, depth=z, split_pairs=True, dtype=self.dtype, name="conv2"
            )(x)
        )
        x = _max_pool_222_split(x)
        z //= 2
        x = nn.relu(_Conv3DFolded(32, depth=z, dtype=self.dtype, name="conv3")(x))
        x = _Conv3DFolded(
            self.num_classes, depth=z, dtype=self.dtype, name="conv4"
        )(x)
        # Loss-facing logits in f32: a bf16 sigmoid quantizes probabilities
        # to ~2^-9 steps around 0.5, which staircases the BCE loss.
        x = x.astype(jnp.float32)
        # Trilinear upsample back to the full grid, entirely in the
        # depth-folded layout: XY via the usual resize matrices, Z as a
        # channel matmul with kron(R_z, I_C) — the old transpose-based Z
        # resize materialized two 5-D minor-3 tensors whose relayouts
        # cost ~3 ms/step in the occ-train profile. The 5-D view is
        # taken once, at the very end (a pure bitcast off the folded
        # row-major layout).
        from ..ops.resize import _resize_matrix, resize_hw

        c = self.num_classes
        x = resize_hw(x, (gx, gy), "bilinear")  # (B, gx, gy, z*C)
        mz = jnp.asarray(
            _resize_matrix(z, gz, "bilinear", False), jnp.float32
        )
        wz = jnp.einsum("Zz,cd->zcZd", mz, jnp.eye(c, dtype=jnp.float32))
        x = x @ wz.reshape(z * c, gz * c)  # (B, gx, gy, gz*C)
        return nn.sigmoid(x).reshape(b, gx, gy, gz, c)
