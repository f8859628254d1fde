"""Memory-frontier sweep (reference scripts/eval_patchwise.py:69-181).

The reference binary-searches the CUDA-OOM frontier over
(batch_size, patchwise_pct, encoder_pct). The TPU analogue: for each
configuration, build the patchwise train step and *measure compiled HBM
usage analytically* via ``jit(...).lower().compile().memory_analysis()``
— no OOM crashes needed; XLA reports temp + argument bytes exactly.
"""
from __future__ import annotations

import argparse
import json


def measure_step_memory(
    model_type: str,
    version: int,
    batch_size: int,
    patchwise_pct: float,
    encoder_pct: float,
    gt_hw=(256, 256),
):
    import jax

    import numpy as np

    from ..core.config import MODEL_TYPES, ModelConfig, TrainConfig
    from ..parallel import mesh as mesh_lib
    from ..train.trainer import Trainer

    mcfg = ModelConfig(
        model_type=model_type, version=version, compute_dtype="bfloat16"
    )
    tcfg = TrainConfig(
        batch_size=batch_size,
        patchwise_percentage=patchwise_pct,
        encoder_percentage=encoder_pct,
    )
    trainer = Trainer(mcfg, tcfg, mesh_lib.make_mesh(shape=(1,)))
    _, w, h = MODEL_TYPES[model_type]

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((batch_size, 3, h, w)).astype(np.float32),
        "disparity": np.abs(rng.standard_normal((batch_size, *gt_hw))).astype(
            np.float32
        ),
        "mask_disp": np.ones((batch_size, *gt_hw), np.float32),
        "seg": rng.random((batch_size, mcfg.num_classes, *gt_hw)).astype(np.float32),
        "mask_seg": np.ones((batch_size, mcfg.num_classes, *gt_hw), np.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch["image"][:1])
    step = trainer._build_step(0)
    device_batch = trainer._shard_batch(batch)
    lowered = step.lower(state, device_batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    out = {"n_patches": len(trainer.masks)}
    for attr in (
        "temp_size_in_bytes",
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(mem, attr, None)
        if v is not None:
            out[attr] = int(v)
    if "temp_size_in_bytes" in out and "argument_size_in_bytes" in out:
        out["total_gb"] = round(
            (out["temp_size_in_bytes"] + out["argument_size_in_bytes"]) / 2**30, 3
        )
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="Patchwise memory sweep")
    parser.add_argument("-t", "--model_type", default="dpt_swin2_tiny_256")
    parser.add_argument("-v", "--version", type=int, default=3)
    parser.add_argument("--batch_sizes", nargs="+", type=int, default=[1, 2, 4, 8])
    parser.add_argument(
        "--patchwise", nargs="+", type=float, default=[1.0, 0.5, 0.25]
    )
    parser.add_argument("--encoder_pct", type=float, default=0.5)
    args = parser.parse_args(argv)

    for bs in args.batch_sizes:
        for pw in args.patchwise:
            try:
                mem = measure_step_memory(
                    args.model_type, args.version, bs, pw, args.encoder_pct
                )
                print(
                    json.dumps(
                        {"batch_size": bs, "patchwise_pct": pw, **mem}
                    )
                )
            except Exception as e:
                print(
                    json.dumps(
                        {"batch_size": bs, "patchwise_pct": pw, "error": str(e)[:200]}
                    )
                )


if __name__ == "__main__":
    main()
