"""Occupancy training CLI (reference scripts/train_SOccDPT_Occupancy.py).

Trains only the 3D occupancy head against GT occupancy grids from the
BDD pipeline: dataset = BDDOccupancy (host GT voxelization, SURVEY.md
§3.4), loss = masked BCE between predicted and GT grids
(reference :295-346), all other params frozen (reference :227-229).
Unlike the reference — whose occupancy_conv is ``nn.Identity``
(SOccDPT.py:245) — the head here is a real 3D CNN
(``occupancy_head=True``).

Grid calibration
----------------
The reference hardcodes ``pc_scale``/``pc_shift`` constants tuned by
hand to *their trained model's* depth scale (SOccDPT.py:145-150; the GT
pipeline uses a different set, bdd_helper.py:198-205). A base model at
a different depth scale (or an untrained one) puts every unprojected
point outside the 256x256x32 volume, the voxel grid comes out all-zero,
and the occupancy head sees no signal — BCE sits at ln 2 forever.
``--calibrate_grid`` (default ``auto``) replays the reference authors'
hand-tuning programmatically: probe the loaded base model's point-cloud
percentiles on a few training samples and derive pc_scale/pc_shift that
map the cloud into the grid volume. ``auto`` only recalibrates when the
reference constants leave <5% of points in bounds.
"""
from __future__ import annotations

import argparse
import dataclasses
import os


import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..core.checkpoint import checkpoint_dir, save_checkpoint
    from ..core.config import GT_OCCUPANCY, ModelConfig
    from ..data.bdd import BDDOccupancy, get_bdd_dataset
    from ..data.loader import iterate_batches, split_train_val
    from ..data.transforms import load_transforms
    from ..models.soccdpt import build_model
    from ..train.losses import masked_bce_loss
    from ..train.metrics import occupancy_iou
    from ..utils.logging import MetricWriter

    parser = argparse.ArgumentParser(description="Train occupancy head")
    parser.add_argument("-t", "--model_type", default="dpt_swin2_tiny_256")
    parser.add_argument("-v", "--version", type=int, default=3)
    parser.add_argument(
        "-b",
        "--base_path",
        default=os.path.expanduser("~/Datasets/Depth_Dataset_Bengaluru"),
    )
    parser.add_argument("-l", "--load", default=None, help="base model checkpoint")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument(
        "-c", "--checkpoint_dir", default=os.path.join(os.getcwd(), "checkpoints")
    )
    parser.add_argument(
        "--val_percent", type=float, default=0.1
    )
    parser.add_argument(
        "--pos_weight",
        default="1.0",
        help="positive-class BCE weight; 'auto' balances classes from the "
        "first batch (occupied cells are ~1e-5 of the grid; unweighted "
        "BCE — the reference's choice — collapses to all-empty). "
        "1.0 = reference-exact",
    )
    parser.add_argument(
        "--calibrate_grid",
        choices=["auto", "on", "off"],
        default="auto",
        help="derive pc_scale/pc_shift from the base model's point cloud "
        "(the programmatic form of the reference's hand-tuned constants, "
        "SOccDPT.py:145-150); auto = only when <5%% of points land in "
        "the grid volume under the reference constants",
    )
    parser.add_argument(
        "--grid",
        type=int,
        nargs=3,
        default=None,
        metavar=("GX", "GY", "GZ"),
        help="occupancy grid resolution override (default 256 256 32); "
        "applies to both the GT voxelizer and the model's grid/head. "
        "GX/GY and GZ must be divisible by 4 (two 2x pools in the head)",
    )
    parser.add_argument(
        "--iou_every",
        type=int,
        default=0,
        help="evaluate val occupancy IoU every N steps and log the "
        "trajectory (0 = final eval only). The reference never reports "
        "this number — its iou_3D is hardcoded 0.0 "
        "(utils/__init__.py:504)",
    )
    parser.add_argument(
        "--iou_samples", type=int, default=4,
        help="val samples per trajectory IoU point",
    )
    parser.add_argument(
        "--bench_jsonl",
        default=None,
        help="append {step, loss, val_iou} trajectory rows to this JSONL "
        "(e.g. TRAIN_BENCH.jsonl)",
    )
    args = parser.parse_args(argv)

    def grid_override(occ, new_grid):
        """Change grid RESOLUTION, not the covered volume:
        occupancy_shape = grid/scale, so scale shrinks with the grid —
        a bare grid_size override would shrink the physical volume
        8-fold at 32^3 and every GT point would land out of bounds
        (all-empty grids, exactly the silent failure the reference's
        hardcoded constants invite — SOccDPT.py:145-150)."""
        factors = [n / o for n, o in zip(new_grid, occ.grid_size)]
        return dataclasses.replace(
            occ,
            grid_size=tuple(new_grid),
            scale=tuple(s * f for s, f in zip(occ.scale, factors)),
        )

    transform, _, _ = load_transforms(args.model_type)
    ds_kwargs = {}
    if args.grid:
        ds_kwargs["occ"] = grid_override(GT_OCCUPANCY, args.grid)
    dataset = get_bdd_dataset(
        BDDOccupancy, transform, args.base_path, dataset_kwargs=ds_kwargs
    )
    # GT frames and unprojection run at the calib camera resolution
    first = dataset.datasets[0]
    camera = first.seq.camera
    for d in dataset.datasets:
        d.target_size = (camera.width, camera.height)
    train_set, val_set = split_train_val(dataset, args.val_percent, seed=0)

    mcfg = ModelConfig(
        model_type=args.model_type,
        version=args.version,
        compute_occ=True,
        occupancy_head=True,  # real 3D CNN, not the reference's Identity
        compute_dtype="bfloat16",
        camera=camera,
    )
    if args.grid:
        mcfg = dataclasses.replace(
            mcfg, occupancy=grid_override(mcfg.occupancy, args.grid)
        )
    model = build_model(mcfg)

    sample = train_set[0]
    x0 = jnp.asarray(sample["image"][None])
    # compute_occ so the occupancy head's params are created
    variables = model.init(jax.random.PRNGKey(0), x0, compute_occ=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.load:
        from ..core.checkpoint import restore_checkpoint

        restored = restore_checkpoint(args.load)
        from ..core.checkpoint import load_params_lenient

        params = load_params_lenient(restored["params"], params)
        batch_stats = restored.get("batch_stats", batch_stats)

    # --- Grid calibration (module docstring) ------------------------------
    def _in_bounds_frac(pts_np, occ):
        from ..ops.geometry import rotate_points

        scale = np.asarray(occ.pc_scale, np.float32)
        shift = np.asarray(occ.pc_shift, np.float32)
        q = pts_np * scale + shift
        q = np.asarray(rotate_points(jnp.asarray(q[None]), occ.correction_angle))[0]
        shape_m = np.asarray(occ.occupancy_shape, np.float32)
        inb = (
            np.isfinite(q).all(-1) & (q >= 0).all(-1) & (q < shape_m).all(-1)
        )
        return float(inb.mean())

    if args.calibrate_grid != "off":
        probe = jax.jit(
            lambda p, bs, img: model.apply(
                {"params": p, "batch_stats": bs},
                img,
                deterministic=True,
                compute_occ=False,
            )[2]
        )
        clouds = []
        for k in range(min(2, len(train_set))):
            s = train_set[k]
            pts = np.asarray(
                probe(params, batch_stats, jnp.asarray(s["image"][None])),
                dtype=np.float32,
            ).reshape(-1, 3)
            pts = pts[np.isfinite(pts).all(-1)]
            # Drop far-plane sentinels: inv_depth clamps at 1e-8 (geometry.py),
            # so depth >= ~1e8 means "the model predicted no depth here" —
            # the reference masks these the same way (SOccDPT.py:392-396).
            pts = pts[np.abs(pts).max(-1) < 9e7]
            clouds.append(pts[:: max(1, len(pts) // 200_000)])
        cloud = np.concatenate(clouds, 0) if clouds else np.zeros((0, 3))
        if len(cloud) < 100:
            print(
                "[calibrate] base model predicts no usable depth "
                f"({len(cloud)} finite in-range points) — keeping reference "
                "constants. Train the base model first (cli/train.py) and "
                "pass it via --load."
            )
            cloud = None
        if cloud is not None:
            frac = _in_bounds_frac(cloud, mcfg.occupancy)
            print(
                f"[calibrate] in-bounds under reference constants: {frac:.4f}"
            )
        if cloud is not None and (args.calibrate_grid == "on" or frac < 0.05):
            shape_m = np.asarray(mcfg.occupancy.occupancy_shape, np.float32)
            lo = np.percentile(cloud, 2.0, axis=0).astype(np.float32)
            hi = np.percentile(cloud, 98.0, axis=0).astype(np.float32)
            span = np.maximum(hi - lo, 1e-6)
            pc_scale = 0.9 * shape_m / span
            pc_shift = 0.05 * shape_m - lo * pc_scale
            mcfg = dataclasses.replace(
                mcfg,
                occupancy=dataclasses.replace(
                    mcfg.occupancy,
                    pc_scale=tuple(float(v) for v in pc_scale),
                    pc_shift=tuple(float(v) for v in pc_shift),
                ),
            )
            model = build_model(mcfg)
            frac = _in_bounds_frac(cloud, mcfg.occupancy)
            print(
                f"[calibrate] pc_scale="
                f"{tuple(round(float(v), 4) for v in pc_scale)} pc_shift="
                f"{tuple(round(float(v), 4) for v in pc_shift)}"
                f" -> in-bounds {frac:.4f}"
            )

    # Train only occupancy_conv (reference :227-229): optimizer sees only
    # that subtree via optax.masked, and the loss stop-gradients every
    # frozen leaf (the reference's requires_grad=False) so XLA dead-code
    # eliminates the backward through the backbone/decoder/voxelizer.
    def occ_only(p):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                "occupancy_conv" in str(getattr(k, "key", "")) for k in path
            ),
            p,
        )

    from ..train.patchwise import select_trainable

    occ_mask = occ_only(params)

    tx = optax.masked(optax.adam(args.learning_rate), occ_only)
    opt_state = tx.init(params)

    if args.pos_weight == "auto":
        g0 = np.asarray(train_set[0]["occupancy_grid"])
        n_pos = float((g0 > 0.5).sum())
        pos_weight = min(float(g0.size - n_pos) / max(n_pos, 1.0), 1e5)
        print(f"[pos_weight] auto -> {pos_weight:.1f} ({int(n_pos)} occupied)")
    else:
        pos_weight = float(args.pos_weight)

    @jax.jit
    def train_step(params, opt_state, batch_stats, image, grid, mask):
        def loss_fn(p):
            p = select_trainable(p, occ_mask)
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                image,
                deterministic=False,
                compute_occ=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            pred_grid = out[3]
            B = pred_grid.shape[0]
            l = masked_bce_loss(
                jnp.clip(pred_grid.reshape(B, -1), 1e-6, 1 - 1e-6),
                grid.reshape(B, -1),
                mask.reshape(B, -1),
                pos_weight=pos_weight,
            )
            return l, updates.get("batch_stats", batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, loss

    @jax.jit
    def forward_occ(params, batch_stats, image):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            image,
            deterministic=True,
            compute_occ=True,
        )[3]

    def val_iou(params, batch_stats, limit=None):
        ious = []
        for n, batch in enumerate(iterate_batches(val_set, 1, shuffle=False)):
            if limit is not None and n >= limit:
                break
            pred = forward_occ(params, batch_stats, jnp.asarray(batch["image"]))
            ious.append(
                occupancy_iou(batch["occupancy_grid"], np.asarray(pred))
            )
        return float(np.mean(ious)) if ious else 0.0

    def bench_row(step, loss, iou):
        if not args.bench_jsonl:
            return
        import json

        with open(args.bench_jsonl, "a") as fh:
            fh.write(
                json.dumps(
                    {
                        "tag": "occ_iou_train",
                        "model_type": args.model_type,
                        "grid": list(
                            args.grid or mcfg.occupancy.grid_size
                        ),
                        "step": step,
                        "loss": None if loss is None else round(loss, 6),
                        "val_iou": round(iou, 6),
                    }
                )
                + "\n"
            )

    writer = MetricWriter(log_dir="logs", run_id="occupancy")
    step = 0
    for epoch in range(1, args.epochs + 1):
        for batch in iterate_batches(train_set, args.batch_size, seed=0, epoch=epoch):
            params, opt_state, batch_stats, loss = train_step(
                params,
                opt_state,
                batch_stats,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["occupancy_grid"]),
                jnp.asarray(batch["mask_occ"].astype(np.float32)),
            )
            metrics = {"loss": float(loss), "epoch": epoch}
            step += 1
            if args.iou_every and step % args.iou_every == 0:
                iou = val_iou(params, batch_stats, limit=args.iou_samples)
                metrics["val_iou"] = iou
                print(f"step {step}: loss {float(loss):.4f} val_iou {iou:.4f}")
                bench_row(step, float(loss), iou)
            writer.log(metrics, step - 1)
            if args.max_steps and step >= args.max_steps:
                break
        run_dir = checkpoint_dir(args.checkpoint_dir, "SOccDPT_Occupancy", "run")
        save_checkpoint(
            os.path.join(run_dir, f"checkpoint_epoch_{epoch}"),
            {"params": params, "batch_stats": batch_stats},
        )
        if args.max_steps and step >= args.max_steps:
            break

    # final eval: occupancy IoU (real, not the reference's 0.0 TODO)
    final_iou = val_iou(params, batch_stats)
    print(f"val iou_3D: {final_iou:.4f}")
    bench_row(step, None, final_iou)
    writer.close()
    return final_iou


if __name__ == "__main__":
    main()
