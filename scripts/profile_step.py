#!/usr/bin/env python
"""Per-HLO-op xprof profile of (a) the compute_occ=True full contract or
(b) one full train step, on the real TPU.

Round-3 measurements: the occ contract runs at ~12 Hz (85 ms) vs 830 Hz
without the grid, and the device-side train step is 71 ms vs a 1.1 ms
forward — this script attributes both.

Usage:
  timeout 1800 python scripts/profile_step.py --what occ
  timeout 1800 python scripts/profile_step.py --what train [--gt_downscale 2]
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


def parse_and_print(logdir: str, iters: int, top: int, stage_of):
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        raise SystemExit(f"no xplane.pb under {logdir}")
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
        if "host_or_device" in rec and rec["host_or_device"] != "Device":
            continue
        rec["op_name"] = rec.get("tf_op_name") or rec.get("operation") or ""
        rec["op_type"] = rec.get("category") or rec.get("type") or "?"
        ops.append(rec)

    by_stage = collections.defaultdict(float)
    by_type = collections.defaultdict(float)
    total = 0.0
    for rec in ops:
        t = float(rec.get("total_self_time") or 0.0) / iters
        by_stage[stage_of(rec["op_name"], rec["op_type"])] += t
        by_type[rec["op_type"]] += t
        total += t
    print(f"\n=== per-iter device time: {total:.1f} us ===")
    print("\n-- by stage --")
    for k, v in sorted(by_stage.items(), key=lambda kv: -kv[1]):
        print(f"{k:16s} {v:10.2f} us  {100 * v / total:5.1f}%")
    print(f"\n-- top {top} ops (us/iter, self time) --")
    ops.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    for rec in ops[:top]:
        t = float(rec.get("total_self_time") or 0.0) / iters
        bw = rec.get("measured_memory_bw") or 0.0
        print(
            f"{t:9.2f}us  bw={bw:7.1f}GB/s "
            f"[{rec['op_type']}] {rec['op_name'][:120]}"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--what", choices=["occ", "train", "occ_train", "serve"], default="occ"
    )
    ap.add_argument("--model_type", default="dpt_swin2_tiny_256")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--train_batch", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=35)
    ap.add_argument("--gt_downscale", type=int, default=1)
    ap.add_argument("--logdir", default="/tmp/step_profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from soccdpt_tpu.core.config import MODEL_TYPES, ModelConfig, TrainConfig
    from soccdpt_tpu.models.soccdpt import build_model
    from soccdpt_tpu.utils.fake_init import structural_init

    _, w, h = MODEL_TYPES[args.model_type]

    if args.what == "serve":
        # The HEADLINE serving forward: full reference contract
        # (camera-res heads + unprojection, compute_occ=False), weights
        # baked as constants — exactly what cli/bench.py times at
        # ~1.2 ms. Per-HLO attribution of that 1.2 ms (VERDICT r4 #3).
        # Inputs VARY per dispatch: identical back-to-back dispatches of
        # a pure-XLA jit are elided below jax through the tunnel
        # (utils/timing.py docstring), which would divide per-op times
        # by a wrong iteration count.
        mcfg = ModelConfig(
            model_type=args.model_type, version=3, compute_dtype="bfloat16"
        )
        model = build_model(mcfg)
        rng = np.random.default_rng(0)
        xs = [
            jnp.asarray(
                rng.standard_normal((args.batch, 3, h, w)), jnp.float32
            )
            for _ in range(args.iters)
        ]
        variables = structural_init(
            model, xs[0], deterministic=True, return_raw=True
        )

        @jax.jit
        def fn(inp):
            return model.apply(
                variables, inp, deterministic=True,
                return_raw=False, compute_occ=False,
            )

        jax.block_until_ready(fn(xs[0]))
        jax.block_until_ready(fn(xs[1]))
        shutil.rmtree(args.logdir, ignore_errors=True)
        with jax.profiler.trace(args.logdir):
            outs = [fn(x) for x in xs]
            jax.block_until_ready(outs)

        def stage_of(name, op_type):
            n = name.lower()
            t = op_type.lower()
            if "idle" in n:
                return "idle"
            if "backbone" in n:
                return "backbone"
            if "refinenet" in n or "_rn/" in n:
                return "decoder"
            if "seg_head" in n or "head/" in n or "/head" in n:
                return "heads"
            if "resize" in n or "bicubic" in n or "nearest" in n:
                return "out_resize"
            if "unproject" in n or "point" in n or "depth" in n:
                return "geometry"
            if (
                "convert" in t or "copy" in t or "transpose" in t
                or "reshape" in t or "bitcast" in t or "fusion" == t
            ):
                return "glue(cast/layout)"
            return "other"

        parse_and_print(args.logdir, args.iters, args.top, stage_of)
        return

    if args.what == "occ":
        mcfg = ModelConfig(
            model_type=args.model_type, version=3, compute_dtype="bfloat16"
        )
        model = build_model(mcfg)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((args.batch, 3, h, w)),
            jnp.float32,
        )
        variables = jax.device_put(
            structural_init(model, x, deterministic=True, return_raw=True)
        )
        from soccdpt_tpu.models.bias_cache import build_inference_cache

        variables = build_inference_cache(
            model, variables, x, deterministic=True, return_raw=True
        )

        @jax.jit
        def fn(v, inp):
            return model.apply(
                v, inp, deterministic=True, return_raw=False, compute_occ=True
            )

        jax.block_until_ready(fn(variables, x))
        jax.block_until_ready(fn(variables, x))
        shutil.rmtree(args.logdir, ignore_errors=True)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.iters):
                out = fn(variables, x)
            jax.block_until_ready(out)

        def stage_of(name, op_type):
            n = name.lower()
            if "idle" in n:
                return "idle"
            if "scatter" in op_type.lower() or "scatter" in n:
                return "occ_scatter"
            if "backbone" in n:
                return "backbone"
            if "refinenet" in n or "_rn/" in n:
                return "decoder"
            if "head" in n:
                return "heads"
            if "resize" in n or "hwc" in n:
                return "resize"
            return "other"

        parse_and_print(args.logdir, args.iters, args.top, stage_of)
        return

    if args.what == "occ_train":
        # Mirrors scripts/occ_train_roofline.py's step construction
        # (cli/train_occupancy.py semantics: occ-only optimizer via
        # optax.masked, frozen leaves stop-gradiented) but profiles a
        # single jitted step per-HLO-op instead of chained timing.
        import optax
        import jax.tree_util as jtu

        from soccdpt_tpu.data.bdd import NUM_CLASSES
        from soccdpt_tpu.train.losses import masked_bce_loss
        from soccdpt_tpu.train.patchwise import select_trainable

        mcfg = ModelConfig(
            model_type=args.model_type,
            version=3,
            compute_occ=True,
            occupancy_head=True,
            compute_dtype="bfloat16",
        )
        model = build_model(mcfg)
        B = args.batch
        rng = np.random.default_rng(0)
        image = rng.standard_normal((B, 3, h, w)).astype(np.float32)
        gs = tuple(mcfg.occupancy.grid_size) + (NUM_CLASSES,)
        grid = (rng.random((B,) + gs) < 2e-5).astype(np.float32)
        variables = structural_init(
            model, jnp.asarray(image[:1]), deterministic=True, compute_occ=True
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        def occ_only(p):
            return jtu.tree_map_with_path(
                lambda path, _: any(
                    "occupancy_conv" in str(getattr(k, "key", ""))
                    for k in path
                ),
                p,
            )

        occ_mask = occ_only(params)
        tx = optax.masked(optax.adam(1e-4), occ_only)
        opt_state = tx.init(params)
        pos_weight = float(
            (grid.size - grid.sum()) / max(grid.sum(), 1.0)
        )
        d_image = jax.device_put(jnp.asarray(image))
        d_grid = jax.device_put(jnp.asarray(grid.reshape(B, -1)))
        d_mask = jax.device_put(jnp.ones_like(d_grid))

        @jax.jit
        def step(params, opt_state, batch_stats):
            def loss_fn(p):
                p = select_trainable(p, occ_mask)
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    d_image,
                    deterministic=False,
                    compute_occ=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
                pred = out[3]
                l = masked_bce_loss(
                    jnp.clip(pred.reshape(B, -1), 1e-6, 1 - 1e-6),
                    d_grid,
                    d_mask,
                    pos_weight=pos_weight,
                )
                return l, updates.get("batch_stats", batch_stats)

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_stats, loss

        params, opt_state, batch_stats, _ = step(
            params, opt_state, batch_stats
        )
        jax.block_until_ready(params)
        shutil.rmtree(args.logdir, ignore_errors=True)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.iters):
                params, opt_state, batch_stats, loss = step(
                    params, opt_state, batch_stats
                )
            jax.block_until_ready(loss)

        def stage_of(name, op_type):
            n = name.lower()
            if "idle" in n:
                return "idle"
            if "occupancy_conv" in n:
                return "occ_head(f+b)"
            if "sort" in n or "segment" in n or "one_hot" in n:
                return "voxelize"
            if "bce" in n or "loss" in n or "log" in n:
                return "loss"
            if "backbone" in n:
                return "backbone"
            if "refinenet" in n or "_rn/" in n:
                return "decoder"
            if "head" in n:
                return "heads"
            if "adam" in n or "update" in n:
                return "optimizer"
            if "resize" in n or "bilinear" in n:
                return "resize"
            return "other"

        parse_and_print(args.logdir, args.iters, args.top, stage_of)
        return

    # ---- train step ----
    from functools import partial

    from soccdpt_tpu.train.trainer import Trainer

    mcfg = ModelConfig(
        model_type=args.model_type, version=3, compute_dtype="bfloat16"
    )
    tcfg = TrainConfig(
        batch_size=args.train_batch, amp=True, gt_downscale=args.gt_downscale
    )
    trainer = Trainer(mcfg, tcfg)
    rng = np.random.default_rng(0)
    B = args.train_batch
    ds = max(args.gt_downscale, 1)
    gh, gw = 1080 // ds, 1920 // ds
    batch = {
        "image": jax.device_put(
            rng.standard_normal((B, 3, h, w)).astype(np.float32)
        ),
        "disparity": jax.device_put(
            np.abs(rng.standard_normal((B, gh, gw))).astype(np.float32)
        ),
        "mask_disp": jax.device_put(np.ones((B, gh, gw), np.float32)),
        "seg": jax.device_put(
            (rng.random((B, 3, gh, gw)) > 0.5).astype(np.float32)
        ),
        "mask_seg": jax.device_put(np.ones((B, 3, gh, gw), np.float32)),
    }
    state = trainer.init_state(
        jax.random.PRNGKey(0), np.asarray(batch["image"][:1])
    )
    step_fn = jax.jit(trainer.build_step_fn(0))
    key = jax.random.PRNGKey(1)
    state, _ = step_fn(state, batch, key)
    jax.block_until_ready(state.params)
    shutil.rmtree(args.logdir, ignore_errors=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            key, sub = jax.random.split(key)
            state, _m = step_fn(state, batch, sub)
        jax.block_until_ready(state.params)

    def stage_of(name, op_type):
        n = name.lower()
        if "idle" in n:
            return "idle"
        if "transpose" in n and "grad" in n:
            return "bwd"
        if "backbone" in n:
            return "backbone(f+b)"
        if "refinenet" in n or "_rn/" in n:
            return "decoder(f+b)"
        if "head" in n:
            return "heads(f+b)"
        if "resize" in n or "bicubic" in n or "nearest" in n:
            return "loss_resize"
        if "loss" in n or "ssi" in n or "bce" in n:
            return "loss"
        if "adam" in n or "update" in n:
            return "optimizer"
        return "other"

    parse_and_print(args.logdir, args.iters, args.top, stage_of)


if __name__ == "__main__":
    main()
