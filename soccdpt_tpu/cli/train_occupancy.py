"""Occupancy training CLI (reference scripts/train_SOccDPT_Occupancy.py).

Trains only the 3D occupancy head against GT occupancy grids from the
BDD pipeline: dataset = BDDOccupancy (host GT voxelization, SURVEY.md
§3.4), loss = masked BCE between predicted and GT grids
(reference :295-346), all other params frozen (reference :227-229).
Unlike the reference — whose occupancy_conv is ``nn.Identity``
(SOccDPT.py:245) — the head here is a real 3D CNN
(``occupancy_head=True``).
"""
from __future__ import annotations

import argparse
import os


import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..core.checkpoint import checkpoint_dir, save_checkpoint
    from ..core.config import ModelConfig
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
    args = parser.parse_args(argv)

    transform, _, _ = load_transforms(args.model_type)
    dataset = get_bdd_dataset(BDDOccupancy, transform, args.base_path)
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
            )
            return l, updates.get("batch_stats", batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, loss

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
            writer.log({"loss": float(loss), "epoch": epoch}, step)
            step += 1
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
    @jax.jit
    def forward_occ(image):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            image,
            deterministic=True,
            compute_occ=True,
        )[3]

    ious = []
    for batch in iterate_batches(val_set, 1, shuffle=False):
        pred = forward_occ(jnp.asarray(batch["image"]))
        ious.append(occupancy_iou(batch["occupancy_grid"], np.asarray(pred)))
    print(f"val iou_3D: {float(np.mean(ious)) if ious else 0.0:.4f}")
    writer.close()


if __name__ == "__main__":
    main()
