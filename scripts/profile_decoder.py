#!/usr/bin/env python
"""Per-HLO-op profile of the flagship forward on the real TPU.

Traces N jitted forwards with jax.profiler, then parses the xplane via
xprof's converter into per-op durations, aggregated by op category and
by decoder stage (backbone / scratch / refinenets / heads / resize
glue). This is the measurement VERDICT r1 item 3 asks for before
attacking the decoder HBM gap.

Usage:  timeout 900 python scripts/profile_decoder.py [--model_type ...]
Writes: /tmp/dec_profile/ (xplane) and prints a sorted op table.
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_type", default="dpt_swin2_tiny_256")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/dec_profile")
    ap.add_argument("--fold_biases", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from soccdpt_tpu.core.config import MODEL_TYPES, ModelConfig
    from soccdpt_tpu.models.soccdpt import build_model
    from soccdpt_tpu.utils.fake_init import structural_init

    mcfg = ModelConfig(
        model_type=args.model_type, version=3, compute_dtype="bfloat16"
    )
    model = build_model(mcfg)
    _, w, h = MODEL_TYPES[args.model_type]
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.batch, 3, h, w)),
        jnp.float32,
    )
    variables = jax.device_put(
        structural_init(model, x, deterministic=True, return_raw=True)
    )
    if args.fold_biases:
        from soccdpt_tpu.models.bias_cache import build_inference_cache

        variables = build_inference_cache(
            model, variables, x, deterministic=True, return_raw=True
        )

    @jax.jit
    def fwd(v, inp):
        return model.apply(v, inp, deterministic=True, return_raw=True)

    # Warm up (compile) outside the trace.
    jax.block_until_ready(fwd(variables, x))
    jax.block_until_ready(fwd(variables, x))

    shutil.rmtree(args.logdir, ignore_errors=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            out = fwd(variables, x)
        jax.block_until_ready(out)

    xplanes = glob.glob(
        os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        raise SystemExit(f"no xplane.pb under {args.logdir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tables = json.loads(data)
    table = tables[0] if isinstance(tables, list) else tables
    cols = [c["id"] for c in table["cols"]]
    ops = []
    for r in table["rows"]:
        rec = {k: (c or {}).get("v") for k, c in zip(cols, r["c"])}
        # two xprof schemas: framework_op_stats-style (host_or_device,
        # type, operation) vs hlo_stats-style (category, tf_op_name).
        if "host_or_device" in rec and rec["host_or_device"] != "Device":
            continue
        rec["op_name"] = rec.get("tf_op_name") or rec.get("operation") or ""
        rec["op_type"] = rec.get("category") or rec.get("type") or "?"
        ops.append(rec)

    def stage_of(name: str) -> str:
        if "IDLE" in name:
            return "idle"
        if "/backbone/" in name:
            return "backbone"
        if "_rn/" in name:
            return "scratch"
        for i in (1, 2, 3, 4):
            if f"refinenet{i}" in name:
                return f"refinenet{i}"
        if "/head/" in name or "depth_net/head" in name:
            return "depth_head"
        if "seg_head" in name:
            return "seg_head"
        if "hWc" in name or "Hwc" in name:
            return "resize_glue"
        return "other"

    per_iter = args.iters
    by_stage = collections.defaultdict(float)
    by_type = collections.defaultdict(float)
    total = 0.0
    for rec in ops:
        t = float(rec.get("total_self_time") or 0.0) / per_iter  # us/iter
        by_stage[stage_of(rec["op_name"])] += t
        by_type[rec["op_type"]] += t
        total += t

    print(f"\n=== per-iter device time: {total:.1f} us "
          f"({args.model_type}, batch {args.batch}) ===")
    print("\n-- by stage --")
    for k, v in sorted(by_stage.items(), key=lambda kv: -kv[1]):
        print(f"{k:14s} {v:9.2f} us  {100 * v / total:5.1f}%")
    print("\n-- by op type --")
    for k, v in sorted(by_type.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{k:22s} {v:9.2f} us  {100 * v / total:5.1f}%")
    print(f"\n-- top {args.top} ops (us/iter, self time) --")
    ops.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    for rec in ops[: args.top]:
        t = float(rec.get("total_self_time") or 0.0) / per_iter
        bw = rec.get("measured_memory_bw") or 0.0
        oi = rec.get("operational_intensity") or 0.0
        print(
            f"{t:8.2f}us  bw={bw:7.1f}GB/s oi={oi:7.1f} "
            f"{str(rec.get('bound_by', '?')):8s} "
            f"[{rec['op_type']}] {rec['op_name']}"
        )


if __name__ == "__main__":
    main()
