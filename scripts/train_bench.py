#!/usr/bin/env python
"""Steady-state train-step wall time on the real TPU (VERDICT r1 item 6).

Flagship config (V3 / dpt_swin2_tiny_256, batch 3, bf16, loss at
camera-resolution GT) on a synthetic 1080p BDD fixture, measured in four
transfer modes:

  sync        — plain shard_batch per step (round-1 baseline: 2.15 s)
  prefetch    — host thread + device double-buffering (device_prefetch)
  gt_ds2      — gt_downscale=2 (4x fewer GT wire bytes)
  both        — prefetch + gt_ds2

Prints one JSON line per mode; appends to TRAIN_BENCH.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--modes", nargs="*",
                    default=["sync", "prefetch", "gt_ds2", "both"])
    ap.add_argument("--model_type", default="dpt_swin2_tiny_256")
    ap.add_argument("--gt_w", type=int, default=1920)
    ap.add_argument("--gt_h", type=int, default=1080)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(REPO / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from soccdpt_tpu.core.config import ModelConfig, TrainConfig
    from soccdpt_tpu.data import synthetic
    from soccdpt_tpu.data.bdd import BDDDepthSegmentation, get_bdd_dataset
    from soccdpt_tpu.data.transforms import load_transforms
    from soccdpt_tpu.data.loader import (
        device_prefetch,
        iterate_batches,
        prefetch,
    )
    from soccdpt_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="bdd1080_")
    synthetic.make_bdd_fixture(
        tmp, frames_per_seq=4, width=args.gt_w, height=args.gt_h
    )
    transform, _, _ = load_transforms(args.model_type)
    import functools

    view = functools.partial(
        BDDDepthSegmentation, target_size=(args.gt_w, args.gt_h)
    )
    ds = get_bdd_dataset(view, transform, tmp)
    print(f"fixture: {len(ds)} frames at {args.gt_w}x{args.gt_h}", flush=True)

    out_path = REPO / "TRAIN_BENCH.jsonl"
    for mode in args.modes:
        gt_ds = 2 if mode in ("gt_ds2", "both") else 1
        use_prefetch = mode in ("prefetch", "both")
        mcfg = ModelConfig(
            model_type=args.model_type, version=3,
            compute_dtype="bfloat16",
        )
        tcfg = TrainConfig(
            batch_size=args.batch, amp=True, gt_downscale=gt_ds,
        )
        trainer = Trainer(mcfg, tcfg)
        sample = ds[0]["image"][None]
        state = trainer.init_state(jax.random.PRNGKey(0), sample)
        rng = jax.random.PRNGKey(1)

        def batches_for(epoch):
            return iterate_batches(
                ds, args.batch, shuffle=True, seed=0, epoch=epoch
            )

        def run(n_steps):
            nonlocal state, rng
            times = []
            it = 0
            epoch = 0
            while it < n_steps:
                src = batches_for(epoch)
                if use_prefetch:
                    src = device_prefetch(
                        prefetch(src, size=2), trainer.shard_batch, depth=2
                    )
                for batch in src:
                    t0 = time.perf_counter()
                    rng, sub = jax.random.split(rng)
                    state, metrics = trainer.train_step(state, batch, sub)
                    # value fetch = real synchronization; block_until_ready
                    # does not synchronize through the axon tunnel. The
                    # reference train loop fetches loss.item() per step
                    # identically (train_SOccDPT.py).
                    float(metrics["loss"])
                    times.append(time.perf_counter() - t0)
                    it += 1
                    if it >= n_steps:
                        break
                epoch += 1
            return times

        run(2)  # compile + warm
        times = run(args.steps)
        times.sort()
        med = times[len(times) // 2]
        row = {
            "mode": mode,
            "median_step_s": round(med, 3),
            "min_step_s": round(times[0], 3),
            "max_step_s": round(times[-1], 3),
            "steps": args.steps,
            "batch": args.batch,
            "gt_downscale": gt_ds,
            "prefetch": use_prefetch,
        }
        print(json.dumps(row), flush=True)
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
