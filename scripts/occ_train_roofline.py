#!/usr/bin/env python
"""DEVICE-side occupancy-train-step roofline (VERDICT r3 next item 3).

Round 3 timed occupancy *training* only on dpt_swin2_test_64; this
measures the flagship (dpt_swin2_tiny_256) occupancy train step — the
~2M-point voxelizer (sort + Pallas one-hot matmul, ops/geometry.py)
runs INSIDE the step at camera resolution, exactly as
cli/train_occupancy.py builds it (occ-only optimizer via optax.masked,
frozen leaves stop-gradiented so XLA dead-code-eliminates the backward
through backbone/decoder/voxelizer — reference freeze semantics
train_SOccDPT_Occupancy.py:227-229).

Same chained-differencing protocol as scripts/train_roofline.py;
appends a row to TRAIN_ROOFLINE.jsonl.
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

V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--model_type", default="dpt_swin2_tiny_256")
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from soccdpt_tpu.core.config import MODEL_TYPES, ModelConfig
    from soccdpt_tpu.models.soccdpt import build_model
    from soccdpt_tpu.train.losses import masked_bce_loss
    from soccdpt_tpu.train.patchwise import select_trainable
    from soccdpt_tpu.utils.fake_init import structural_init

    mcfg = ModelConfig(
        model_type=args.model_type,
        version=3,
        compute_occ=True,
        occupancy_head=True,
        compute_dtype="bfloat16",
    )
    model = build_model(mcfg)

    _, net_w, net_h = MODEL_TYPES[args.model_type]
    B = args.batch
    rng = np.random.default_rng(0)
    image = rng.standard_normal((B, 3, net_h, net_w)).astype(np.float32)

    from soccdpt_tpu.data.bdd import NUM_CLASSES

    # GT grid carries the semantic class channel: (B, gx, gy, gz, C),
    # matching the model's occupancy output (models/soccdpt.py docstring)
    # and BDDOccupancy.voxelize.
    gs = tuple(mcfg.occupancy.grid_size) + (NUM_CLASSES,)
    grid = (rng.random((B,) + gs) < 2e-5).astype(np.float32)
    mask = np.ones_like(grid, np.float32)

    variables = structural_init(
        model, jnp.asarray(image[:1]), deterministic=True, compute_occ=True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    import jax.tree_util as jtu

    def occ_only(p):
        return jtu.tree_map_with_path(
            lambda path, _: any(
                "occupancy_conv" in str(getattr(k, "key", "")) for k in path
            ),
            p,
        )

    occ_mask = occ_only(params)
    tx = optax.masked(optax.adam(1e-4), occ_only)
    opt_state = tx.init(params)
    pos_weight = float((grid.size - grid.sum()) / max(grid.sum(), 1.0))

    d_image = jax.device_put(jnp.asarray(image))
    d_grid = jax.device_put(jnp.asarray(grid.reshape(B, -1)))
    d_mask = jax.device_put(jnp.asarray(mask.reshape(B, -1)))

    def one_step(params, opt_state, batch_stats):
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

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, loss

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0, 1, 2))
    def chained(params, opt_state, batch_stats, n):
        def body(i, carry):
            p, o, bs, _ = carry
            return one_step(p, o, bs)

        return jax.lax.fori_loop(
            0, n, body, (params, opt_state, batch_stats, jnp.float32(0))
        )

    lowered = chained.lower(params, opt_state, batch_stats, args.chain)
    compiled = lowered.compile()
    try:
        flops_chain = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_chain = float("nan")

    state = (params, opt_state, batch_stats)

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        p, o, bs, loss = chained(*state, n)
        float(loss)
        state = (p, o, bs)
        return time.perf_counter() - t0

    timed(1)
    timed(args.chain)
    t1 = min(timed(1) for _ in range(args.repeats))
    tn = min(timed(args.chain) for _ in range(args.repeats))
    per_step = (tn - t1) / (args.chain - 1)
    flops_step = flops_chain / args.chain if flops_chain == flops_chain else None
    mfu = flops_step / per_step / V5E_BF16_PEAK if flops_step else None

    row = {
        "tag": args.tag or "flagship_occ_train",
        "model_type": args.model_type,
        "batch": B,
        "grid": list(gs),
        "remat": False,
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
