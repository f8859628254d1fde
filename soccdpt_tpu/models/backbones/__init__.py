"""Backbone registry.

Maps the reference's encoder names (reference blocks.py:31-136
``_make_encoder``) to flax backbone factories. Every backbone is a
module whose ``__call__(x_nhwc, deterministic)`` returns the tuple of
stage feature maps (NHWC) — no forward hooks, no global state
(replaces reference backbones/utils.py:54-133).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

from flax import linen as nn


def make_backbone(
    name: str,
    hooks: Optional[Sequence[int]] = None,
    dtype: Any = None,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
) -> Tuple[nn.Module, Tuple[int, ...]]:
    """Return (backbone module factory, stage channel widths)."""
    import jax.numpy as jnp

    dtype = dtype if dtype is not None else jnp.float32

    if name in ("swin2t16_256", "swin2b24_384", "swin2l24_384", "swin2test_64"):
        from .swin2 import make_swin2_backbone

        # The window-attention kernel loses to XLA at these shapes
        # (PERF.md) — opt-in only.
        return make_swin2_backbone(
            name, hooks=hooks, dtype=dtype, use_pallas=bool(use_pallas),
            remat=remat,
        )
    if name in ("swinl12_384", "swin1test_64"):
        from .swin import make_swin1_backbone

        return make_swin1_backbone(name, hooks=hooks, dtype=dtype)
    if name in (
        "vitb16_384",
        "vitl16_384",
        "beitb16_384",
        "beitl16_384",
        "beitl16_512",
        "vittest_64",
        "beittest_64",
    ):
        from .vit import make_vit_backbone

        return make_vit_backbone(
            name, hooks=hooks, dtype=dtype, use_pallas=use_pallas
        )
    if name in ("vitb_rn50_384", "hybridtest_64"):
        from .vit_hybrid import make_vit_hybrid_backbone

        return make_vit_hybrid_backbone(name, hooks=hooks, dtype=dtype)
    if name in ("levit_384", "levittest_64"):
        from .levit import make_levit_backbone

        return make_levit_backbone(name, hooks=hooks, dtype=dtype)
    if name in ("next_vit_large_6m", "nextvittest_64"):
        from .next_vit import make_next_vit_backbone

        return make_next_vit_backbone(name, hooks=hooks, dtype=dtype)
    raise ValueError(f"backbone {name!r} not implemented")


def dpt_extras(name: str, dtype=None):
    """Backbone-specific DPT wiring (reference dpt.py:111-138): LeViT is
    a 3-level pyramid with a fixed refinenet3 size and a transposed-conv
    stem before the head."""
    import functools

    import jax.numpy as jnp

    dtype = dtype if dtype is not None else jnp.float32
    if name.startswith("levit"):
        from .levit import LEVIT_CONFIGS, StemTranspose

        cfg = LEVIT_CONFIGS[name]
        g = cfg.img_size // 16
        size3 = (-(-g // 2), -(-g // 2))  # grid of level 2 (reference: 7)
        return {
            "size_refinenet3": size3,
            "stem_transpose": functools.partial(StemTranspose, dtype=dtype),
        }
    return {}
