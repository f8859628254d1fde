"""End-to-end serving pipeline: raw camera frames -> occupancy, one jit.

The reference's deployment path runs cv2 preprocessing on host, the
network under onnxruntime, and numpy geometry after
(run_SOccDPT_onnx.py; SURVEY.md §3.5). Here the whole pipeline — uint8
decode-normalize-resize, backbone+decoder+heads, unprojection, optional
voxelization — is a single jitted function (BASELINE.json north star:
"fuse the camera preprocessing with the backbone"), so one host->device
transfer of the raw frame is the only data movement per request.
"""
from __future__ import annotations

import collections
from typing import Any, Callable, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp

from .core.config import MODEL_TYPES, ModelConfig
from .data.transforms import device_preprocess
from .models.soccdpt import build_model


def make_serving_fn(
    cfg: ModelConfig,
    variables: Any,
    compute_occ: bool = False,
    output_size: Optional[Tuple[int, int]] = None,
    use_pallas: Optional[bool] = None,
    jit: bool = True,
    fold_biases: bool = True,
    bias_cache_dtype: Any = None,
) -> Callable:
    """Build ``serve(frames_u8) -> (inv_depth, seg, points, occ|None)``.

    frames_u8: (B, H, W, 3) uint8 RGB at any camera resolution.
    Outputs are at camera resolution (or ``output_size``), matching the
    reference model forward contract (SOccDPT.py:366-372).

    ``fold_biases`` precomputes every param-derived attention-bias
    tensor once at bind time (models/bias_cache.py) — these gathers
    otherwise dominate single-dispatch latency on TPU. Weights are
    frozen inside a serving fn, so the fold is always valid here.
    """
    model = build_model(cfg, use_pallas=use_pallas)
    _, net_w, net_h = MODEL_TYPES[cfg.model_type]
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    if fold_biases:
        # Always rebuilt from the CURRENT params (build_inference_cache
        # discards any cache riding in `variables` — a stale one would
        # otherwise silently serve biases from older weights).
        from .models.bias_cache import build_inference_cache

        example = jnp.zeros((1, 3, net_h, net_w), jnp.float32)
        variables = build_inference_cache(
            model, variables, example, cache_dtype=bias_cache_dtype,
            deterministic=True, return_raw=True,
        )

    def serve(v, frames_u8: jnp.ndarray):
        x = device_preprocess(frames_u8, (net_w, net_h), dtype=dtype)
        return model.apply(
            v,
            x,
            deterministic=True,
            compute_occ=compute_occ,
            output_size=output_size,
        )

    if not jit:
        return lambda frames_u8: serve(variables, frames_u8)
    # Weights as a jit argument (one up-front transfer), not a closure:
    # closed-over trees ship with the module at compile time and
    # overflow the remote-compile transport for 200M+ param models.
    variables = jax.device_put(variables)
    served = jax.jit(serve)
    return lambda frames_u8: served(variables, frames_u8)


def serve_stream(
    serve_fn: Callable,
    frames: Iterable,
    depth: int = 2,
    host_prefetch: int = 2,
) -> Iterator:
    """Pipelined serving over a stream of camera frames.

    The reference's deployment loop is fully sequential — read frame,
    preprocess, run, postprocess, repeat (run_SOccDPT_onnx.py). Here
    three stages overlap: a background thread pulls from the (possibly
    slow) frame source, ``jax.device_put`` ships upcoming frames while
    the TPU computes (transfers are async), and ``depth`` forward
    dispatches stay in flight so per-request wire latency hides behind
    compute. Yields fully-materialized outputs in order.
    """
    from .data.loader import device_prefetch, prefetch

    inflight: "collections.deque" = collections.deque()
    on_device = device_prefetch(
        prefetch(frames, size=host_prefetch), jax.device_put, depth=depth
    )
    for xd in on_device:
        inflight.append(serve_fn(xd))
        if len(inflight) >= depth:
            yield jax.block_until_ready(inflight.popleft())
    while inflight:
        yield jax.block_until_ready(inflight.popleft())
