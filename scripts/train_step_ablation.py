#!/usr/bin/env python
"""Decompose the train-step device time by ablating the loss path.

Round-3 left 71.5 ms/step (0.51% MFU) unexplained. The xprof profile
attributes 75% to un-named fusions + gathers in the loss path (the
strided-slice gradient pyramid and its transpose at 1080x1920). This
script times step VARIANTS with the chained-jit protocol to pin the cost:

  full        : the product step (resize to GT + SSI 4-scale + BCE)
  no_pyramid  : alpha=0 (drop the gradient-matching pyramid)
  mse_only    : SSI data term only, seg BCE kept
  no_resize   : loss on net-resolution GT (256x256), full SSI
  trivial     : mean(outputs) loss - pure model fwd+bwd floor

Usage: timeout 1200 python scripts/train_step_ablation.py [--batch 3]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--model_type", default="dpt_swin2_tiny_256")
    ap.add_argument("--chain", type=int, default=11)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from soccdpt_tpu.core.config import MODEL_TYPES, ModelConfig, TrainConfig
    from soccdpt_tpu.ops.resize import resize_nchw
    from soccdpt_tpu.train.losses import (
        joint_loss,
        masked_bce_loss,
        scale_and_shift_invariant_loss,
    )
    from soccdpt_tpu.train.trainer import Trainer

    mcfg = ModelConfig(
        model_type=args.model_type, version=3, compute_dtype="bfloat16"
    )
    tcfg = TrainConfig(batch_size=args.batch, amp=True)
    trainer = Trainer(mcfg, tcfg)
    model = trainer.model
    tx = trainer.tx

    _, net_w, net_h = MODEL_TYPES[args.model_type]
    rng = np.random.default_rng(0)
    B = args.batch
    gh, gw = 1080, 1920
    batch = {
        "image": jax.device_put(
            rng.standard_normal((B, 3, net_h, net_w)).astype(np.float32)
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
    mask = trainer.masks[0]
    from soccdpt_tpu.train.patchwise import select_trainable, zero_frozen_grads

    def make_step(variant):
        def loss_fn(params, batch_stats, b, key):
            p = select_trainable(params, mask)
            (inv_depth, seg), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                b["image"],
                deterministic=False,
                return_raw=True,
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            new_stats = updates.get("batch_stats", batch_stats)
            if variant == "trivial":
                total = jnp.mean(inv_depth.astype(jnp.float32)) + jnp.mean(
                    seg.astype(jnp.float32)
                )
                return total, new_stats
            if variant == "no_resize":
                tgt = b["disparity"][:, : net_h, : net_w]
                mk = b["mask_disp"][:, : net_h, : net_w]
                sg = b["seg"][:, :, : net_h, : net_w]
                mks = b["mask_seg"][:, :, : net_h, : net_w]
                l_d = scale_and_shift_invariant_loss(
                    inv_depth.astype(jnp.float32), tgt, mk
                )
                l_s = masked_bce_loss(seg.astype(jnp.float32), sg, mks)
                return 0.5 * l_d + 0.5 * l_s, new_stats
            gt_hw = b["disparity"].shape[-2:]
            disp_pred = resize_nchw(
                inv_depth.astype(jnp.float32), gt_hw, "bicubic", False
            )
            seg_pred = resize_nchw(seg.astype(jnp.float32), gt_hw, "nearest")
            if variant == "resize_only":
                total = jnp.mean(disp_pred) + jnp.mean(seg_pred)
                return total, new_stats
            alpha = {"full": 0.5, "no_pyramid": 0.0, "mse_only": 0.0}[variant]
            l_d = scale_and_shift_invariant_loss(
                disp_pred, b["disparity"], b["mask_disp"], alpha=alpha
            )
            l_s = masked_bce_loss(seg_pred, b["seg"], b["mask_seg"])
            return 0.5 * l_d + 0.5 * l_s, new_stats

        def step(st, b, key):
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params, st.batch_stats, b, key)
            grads = zero_frozen_grads(grads, mask)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            updates = zero_frozen_grads(updates, mask)
            new_params = optax.apply_updates(st.params, updates)
            return st.replace(
                step=st.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            )

        return step

    results = {}
    for variant in ["trivial", "resize_only", "mse_only", "no_pyramid", "full"]:
        step = make_step(variant)

        @partial(jax.jit, static_argnums=(3,))
        def chained(st, b, key, n, _step=step):
            def body(i, carry):
                s, k = carry
                k, sub = jax.random.split(k)
                return (_step(s, b, sub), k)

            s, _ = jax.lax.fori_loop(0, n, body, (st, key))
            return s

        def timed(n):
            t0 = time.perf_counter()
            s = chained(state, batch, jax.random.PRNGKey(2), n)
            float(jnp.asarray(s.step))
            return time.perf_counter() - t0

        timed(1)
        timed(args.chain)
        t1 = min(timed(1) for _ in range(args.repeats))
        tn = min(timed(args.chain) for _ in range(args.repeats))
        per_step = (tn - t1) / (args.chain - 1) * 1e3
        results[variant] = round(per_step, 3)
        print(json.dumps({"variant": variant, "ms_per_step": results[variant]}),
              flush=True)

    print(json.dumps({"ablation": results, "batch": B}), flush=True)


if __name__ == "__main__":
    main()
