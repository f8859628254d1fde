"""Training CLI (reference scripts/train_SOccDPT.py).

Reads the reference's sweep-JSON schema (config/*.json), applies CLI
overrides (version/dataset/model_type/checkpoint_dir/base_path), runs
grid/random trials locally (no wandb service needed), and trains with
the pjit trainer: periodic eval rounds feed the plateau LR controller
and per-epoch checkpoints are written under
``checkpoints/<project>/<run_id>/`` like the reference
(train_SOccDPT.py:437-449).

Usage:
  python -m soccdpt_tpu.cli.train -v 3 -dt bdd -t dpt_swin2_tiny_256 \
      --sweep_json config/SOccDPT_V3_dpt_swin2_tiny_256.json
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict, Optional

import numpy as np


def build_datasets(tcfg, model_type: str):
    """Dataset selection (reference train_SOccDPT.py:179-202)."""
    from ..data.anue_labels import (
        LEVEL4_BASICS_ID,
        level4_basics_to_class,
        level4_basics_to_color,
    )
    from ..data.bdd import (
        BDDDepthSegmentation,
        class_2_color as class_2_color_bdd,
        get_bdd_dataset,
    )
    from ..data.idd import get_all_IDD_Depth_Segmentation_datasets
    from ..data.bdd import ConcatDataset
    from ..data.transforms import load_transforms

    transform, _, _ = load_transforms(model_type)
    name = tcfg.dataset
    if "idd" in name:
        train_ds, val_ds = get_all_IDD_Depth_Segmentation_datasets(
            transform,
            level_id=LEVEL4_BASICS_ID,
            level_2_class=level4_basics_to_class,
        )
        dataset = ConcatDataset([train_ds, val_ds])
        num_classes = len(set(level4_basics_to_class.values()))
        class_2_color = level4_basics_to_color
    elif "bdd" in name:
        dataset = get_bdd_dataset(
            BDDDepthSegmentation, transform, tcfg.base_path
        )
        num_classes = 3
        class_2_color = class_2_color_bdd
    else:
        raise ValueError(f"unknown dataset {name!r}")
    return dataset, num_classes, class_2_color


def dataset_camera(dataset):
    """Camera intrinsics from the first BDD sequence, if any (IDD ships
    no calib -> None, callers fall back to the default CameraConfig)."""
    ds = dataset
    while hasattr(ds, "datasets"):
        ds = ds.datasets[0]
    seq = getattr(ds, "seq", None)
    return getattr(seq, "camera", None)


def train_one(
    tcfg,
    model_type: str,
    version: int,
    run_id: str,
    use_pallas: bool = False,
    max_steps: Optional[int] = None,
    log_dir: Optional[str] = None,
    camera=None,
) -> Dict[str, float]:
    import jax

    from ..core.checkpoint import checkpoint_dir, save_checkpoint
    from ..core.config import ModelConfig
    from ..data.loader import (
        device_prefetch,
        iterate_batches,
        prefetch,
        split_train_val,
    )
    from ..parallel import mesh as mesh_lib
    from ..train.evaluate import evaluate_depth_seg, make_eval_forward
    from ..train.trainer import Trainer
    from ..utils.logging import MetricWriter
    from ..utils.timing import StepTimer

    dataset, num_classes, class_2_color = build_datasets(tcfg, model_type)
    if camera is None:
        camera = dataset_camera(dataset)
    train_set, val_set = split_train_val(
        dataset, tcfg.val_percent, tcfg.dataset_percentage, seed=tcfg.seed
    )
    print(f"train={len(train_set)} val={len(val_set)}")

    mcfg_kw = dict(
        model_type=model_type,
        version=version,
        num_classes=num_classes,
        sigmoid=tcfg.sigmoid,
        compute_dtype="bfloat16" if tcfg.amp else "float32",
    )
    if camera is not None:
        mcfg_kw["camera"] = camera
    mcfg = ModelConfig(**mcfg_kw)

    # tp > 1 -> (data, model) mesh built by the Trainer itself; tp == 1
    # -> 1-D data mesh over the largest batch-dividing device count.
    mesh = None if tcfg.tp > 1 else mesh_lib.mesh_for_batch(tcfg.batch_size)
    trainer = Trainer(mcfg, tcfg, mesh, use_pallas=use_pallas)
    print(f"mesh: {dict(trainer.mesh.shape)}")

    sample = train_set[0]
    state = trainer.init_state(
        jax.random.PRNGKey(tcfg.seed), sample["image"][None]
    )
    if tcfg.load:
        from ..core.torch_import import (
            family_of,
            import_soccdpt,
            load_torch_state_dict,
            merge_into,
        )

        if tcfg.load.endswith((".pth", ".pt")):
            sd = load_torch_state_dict(tcfg.load)
            p, s = import_soccdpt(sd, version, family_of(mcfg.backbone))
            state = dataclasses.replace(
                state,
                params=merge_into(jax.device_get(state.params), p),
                batch_stats=merge_into(jax.device_get(state.batch_stats), s),
            )
        else:
            from ..core.checkpoint import restore_checkpoint

            restored = restore_checkpoint(tcfg.load)
            # weights only, fresh optimizer — the reference's --load
            # semantics (base_model.load_net); exact resume incl.
            # opt_state goes through restore_checkpoint with a target
            state = dataclasses.replace(
                state,
                params=restored["params"],
                batch_stats=restored.get("batch_stats", state.batch_stats),
            )
        # restored/imported leaves are host or foreign-topology arrays —
        # place them onto this trainer's mesh (tp rules included)
        state = trainer.reshard_state(state)

    writer = MetricWriter(log_dir=log_dir, run_id=run_id)
    timer = StepTimer()
    rng = jax.random.PRNGKey(tcfg.seed + 1)
    global_step = 0
    division_step = max(len(train_set) // (3 * tcfg.batch_size), 1)
    last_eval: Dict[str, float] = {}

    for epoch in range(1, tcfg.epochs + 1):
        # host-thread prefetch (decode overlaps compute) + device
        # double-buffering (batch N+1's transfer overlaps step N)
        batches = device_prefetch(
            prefetch(
                iterate_batches(
                    train_set,
                    tcfg.batch_size,
                    shuffle=True,
                    seed=tcfg.seed,
                    epoch=epoch,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                )
            ),
            trainer.shard_batch,
        )
        for batch in batches:
            rng, sub = jax.random.split(rng)
            state, metrics = trainer.train_step(state, batch, sub)
            timer.tick()
            loss = float(metrics["loss"])
            writer.log(
                {
                    **{k: float(v) for k, v in metrics.items()},
                    "epoch": epoch,
                    "lr": trainer.scheduler.lr,
                    "step_time_s": timer.mean,
                },
                step=global_step,
            )

            if global_step % division_step == 0:
                forward = make_eval_forward(
                    trainer.model,
                    {"params": state.params, "batch_stats": state.batch_stats},
                )
                last_eval = evaluate_depth_seg(
                    forward,
                    iterate_batches(val_set, 1, shuffle=False),
                    max_batches=16,
                )
                writer.log({f"val/{k}": v for k, v in last_eval.items()}, global_step)
                if tcfg.log_histograms:
                    from ..utils.logging import param_histograms

                    writer.log(param_histograms(state.params), global_step)
                if tcfg.log_visuals and log_dir:
                    # eval-round side-by-side panel, like the reference's
                    # wandb.Image logging (utils/__init__.py:646-753)
                    from ..utils import visualize

                    s0 = val_set[0]
                    inv_d, seg_p = forward(jax.numpy.asarray(s0["image"][None]))
                    panel = visualize.eval_panel(
                        s0["image_raw"],
                        np.asarray(inv_d[0], np.float32),
                        s0.get("disparity"),
                        np.asarray(seg_p[0], np.float32),
                        s0.get("seg"),
                        class_2_color,
                    )
                    visualize.save_image(
                        os.path.join(
                            log_dir, f"{run_id}_step{global_step:06d}.png"
                        ),
                        panel,
                    )
                state = trainer.on_plateau_metric(state, loss)
            global_step += 1
            if max_steps is not None and global_step >= max_steps:
                break
        if tcfg.save_checkpoint:
            run_dir = checkpoint_dir(tcfg.checkpoint_dir, tcfg.project_name, run_id)
            save_checkpoint(
                os.path.join(run_dir, f"checkpoint_epoch_{epoch}"),
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": np.asarray(state.step),
                },
            )
            print(f"Checkpoint {epoch} saved!")
        if max_steps is not None and global_step >= max_steps:
            break
    writer.close()
    return last_eval


def main(argv=None):
    from ..core.config import MODEL_TYPES, SweepConfig, train_config_from_params

    parser = argparse.ArgumentParser(description="Train SOccDPT (TPU)")
    parser.add_argument("-v", "--version", type=int, choices=[1, 2, 3], required=True)
    parser.add_argument("-n", "--count", type=int, default=1)
    parser.add_argument(
        "-dt", "--dataset", choices=["bdd", "idd", "idd+bdd"], required=True
    )
    parser.add_argument(
        "-t", "--model_type", choices=list(MODEL_TYPES), required=True
    )
    parser.add_argument(
        "-c", "--checkpoint_dir", default=os.path.join(os.getcwd(), "checkpoints")
    )
    parser.add_argument(
        "-b",
        "--base_path",
        default=os.path.expanduser("~/Datasets/Depth_Dataset_Bengaluru"),
    )
    parser.add_argument("--sweep_json", required=True)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--use_pallas", action="store_true")
    parser.add_argument("--log_dir", default="logs")
    parser.add_argument(
        "--tp",
        type=int,
        default=1,
        help="tensor-parallel axis size: devices form a (data, model) "
        "mesh with model=TP; large weight matrices shard over 'model' "
        "(parallel/sharding.py) and XLA inserts the ICI collectives",
    )
    args = parser.parse_args(argv)

    sweep = SweepConfig.load(args.sweep_json)
    sweep.override(
        dataset=args.dataset,
        checkpoint_dir=args.checkpoint_dir,
        base_path=args.base_path,
    )
    project_name = (
        f"SOccDPT_V{args.version}_{args.model_type}_{args.dataset}"
    )

    results = []
    for i, params in enumerate(sweep.trials(count=args.count)):
        tcfg = train_config_from_params(params)
        tcfg = dataclasses.replace(tcfg, project_name=project_name)
        run_id = f"trial{i:03d}"
        print(f"=== {project_name} {run_id}: {params}")
        results.append(
            train_one(
                tcfg,
                args.model_type,
                args.version,
                run_id,
                use_pallas=args.use_pallas,
                max_steps=args.max_steps,
                log_dir=args.log_dir,
            )
        )
    return results


if __name__ == "__main__":
    main()
