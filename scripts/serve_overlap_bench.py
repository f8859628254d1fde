#!/usr/bin/env python
"""Measure serve_stream dispatch pipelining (VERDICT r2 weak item 5).

Round 2 validated serve_stream end-to-end but only through the axon
tunnel with host-resident frames, where the 6 MB/frame wire cost hides
everything. This bench isolates the DISPATCH-overlap claim: frames are
already device-resident (zero wire bytes per frame), every yielded
output is value-synced (a consumer reading results — the honest serving
situation), and the only variable is ``depth``: how many forward
dispatches stay in flight. depth=1 is the reference's fully-sequential
loop shape; depth>=2 overlaps the next dispatches with the current
result fetch.

Appends one JSON line per depth to SERVE_OVERLAP.jsonl.

Usage: timeout 1800 python scripts/serve_overlap_bench.py [--frames 64]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_type", default="dpt_swin2_tiny_256")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--depths", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from soccdpt_tpu.core.config import ModelConfig
    from soccdpt_tpu.models.soccdpt import build_model
    from soccdpt_tpu.serving import make_serving_fn, serve_stream
    from soccdpt_tpu.utils.fake_init import structural_init

    mcfg = ModelConfig(
        model_type=args.model_type, version=3, compute_dtype="bfloat16"
    )
    model = build_model(mcfg)
    import jax.numpy as jnp

    ex = jnp.zeros((1, 3, 256, 256), jnp.float32)
    variables = structural_init(model, ex, deterministic=True, return_raw=True)
    serve = make_serving_fn(mcfg, variables)

    rng = np.random.default_rng(0)
    frames_dev = [
        jax.device_put(
            rng.integers(0, 255, (1, args.height, args.width, 3)).astype(
                np.uint8
            )
        )
        for _ in range(args.frames)
    ]
    jax.block_until_ready(frames_dev)

    def consume(out):
        # a consumer reading the result: value-sync one scalar per output
        return float(np.asarray(out[0]).ravel()[0])

    def run(depth):
        t0 = time.perf_counter()
        acc = 0.0
        for out in serve_stream(
            serve, iter(frames_dev), depth=depth, host_prefetch=2
        ):
            acc += consume(out)
        dt = time.perf_counter() - t0
        return dt, acc

    rows = []
    run(args.depths[0])  # compile warmup
    for depth in args.depths:
        dt = min(run(depth)[0] for _ in range(args.repeats))
        fps = args.frames / dt
        row = {
            "model_type": args.model_type,
            "depth": depth,
            "frames": args.frames,
            "fps_value_synced": round(fps, 1),
            "s_total": round(dt, 3),
            "frame_hw": [args.height, args.width],
            "source": "device-resident",
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with (REPO / "SERVE_OVERLAP.jsonl").open("a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
