#!/usr/bin/env python
"""DEVICE-side train-step roofline (VERDICT r2 weak item 2 / next item 3).

TRAIN_BENCH.jsonl times steps through the axon tunnel (wall clock,
wire-dominated). This script measures the pure device cost: N train
steps chained inside ONE jit over device-resident synthetic batches
(the same chained-differencing protocol as cli/bench.py uses for
inference), so dispatch latency and host<->device transfer are excluded.

Reports ms/step, the ratio to the forward-only floor, and training MFU
from the compiled executable's own FLOP count. Appends one JSON line per
config to TRAIN_ROOFLINE.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = pathlib.Path(__file__).resolve().parent.parent

V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (PERF.md per-op table)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--model_type", default="dpt_swin2_tiny_256")
    ap.add_argument("--gt_w", type=int, default=1920)
    ap.add_argument("--gt_h", type=int, default=1080)
    ap.add_argument("--gt_downscale", type=int, default=1)
    ap.add_argument("--chain", type=int, default=11)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--encoder_pct", type=float, default=0.5)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from soccdpt_tpu.core.config import ModelConfig, TrainConfig
    from soccdpt_tpu.train.trainer import Trainer

    mcfg = ModelConfig(
        model_type=args.model_type, version=3, compute_dtype="bfloat16"
    )
    tcfg = TrainConfig(
        batch_size=args.batch,
        amp=True,
        encoder_percentage=args.encoder_pct,
        gt_downscale=args.gt_downscale,
        remat_backbone=args.remat,
    )
    trainer = Trainer(mcfg, tcfg)

    from soccdpt_tpu.core.config import MODEL_TYPES

    _, net_w, net_h = MODEL_TYPES[args.model_type]
    rng = np.random.default_rng(0)
    B = args.batch
    ds = max(args.gt_downscale, 1)
    gh, gw = args.gt_h // ds, args.gt_w // ds
    host_batch = {
        "image": rng.standard_normal((B, 3, net_h, net_w)).astype(np.float32),
        "disparity": np.abs(rng.standard_normal((B, gh, gw))).astype(
            np.float32
        ),
        "mask_disp": np.ones((B, gh, gw), np.float32),
        "seg": (rng.random((B, 3, gh, gw)) > 0.5).astype(np.float32),
        "mask_seg": np.ones((B, 3, gh, gw), np.float32),
    }
    # device-resident once; gt_downscale already applied above
    batch = {
        k: jax.device_put(v) for k, v in host_batch.items()
    }

    state = trainer.init_state(jax.random.PRNGKey(0), host_batch["image"][:1])
    step_fn = trainer.build_step_fn(0)  # flagship: patchwise 1.0 -> 1 mask

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def chained(state, b, key, n):
        def body(i, carry):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _metrics = step_fn(st, b, sub)
            return (st, k)

        st, _ = jax.lax.fori_loop(0, n, body, (state, key))
        return st

    # FLOP count straight from the compiled executable
    lowered = chained.lower(state, batch, jax.random.PRNGKey(1), args.chain)
    compiled = lowered.compile()
    try:
        flops_chain = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_chain = float("nan")

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        new_state = chained(state, batch, jax.random.PRNGKey(2), n)
        # value fetch = real sync through the tunnel
        float(jnp.asarray(new_state.step))
        state = new_state
        return time.perf_counter() - t0

    timed(1)
    timed(args.chain)
    t1 = min(timed(1) for _ in range(args.repeats))
    tn = min(timed(args.chain) for _ in range(args.repeats))
    per_step = (tn - t1) / (args.chain - 1)
    flops_step = flops_chain / args.chain if flops_chain == flops_chain else None
    mfu = (
        flops_step / per_step / V5E_BF16_PEAK if flops_step else None
    )

    row = {
        "tag": args.tag or "default",
        "model_type": args.model_type,
        "batch": B,
        "gt_hw": [gh, gw],
        "remat": args.remat,
        "encoder_pct": args.encoder_pct,
        "device_ms_per_step": round(per_step * 1e3, 3),
        "img_per_s_device": round(B / per_step, 1),
        "flops_per_step": flops_step,
        "train_mfu_vs_v5e_bf16_peak": round(mfu, 4) if mfu else None,
        "chain": args.chain,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(row), flush=True)
    with (REPO / "TRAIN_ROOFLINE.jsonl").open("a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
