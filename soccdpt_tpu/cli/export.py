"""Model export (reference scripts/export_SOccDPT.py).

The reference exports ONNX (opset 13, dynamic batch); the TPU-native
deployment artifact is serialized StableHLO via ``jax.export``: the
jitted forward (with weights baked in) is lowered once and written to
disk; ``cli/run_exported.py`` reloads and executes it without the model
source — the serving analogue of the reference's onnxruntime flow.
"""
from __future__ import annotations

import argparse
import os


def export_model(
    model_type: str,
    version: int,
    out_path: str,
    load: str | None = None,
    batch: int | None = None,
    use_pallas: bool = False,
    with_points: bool = False,
) -> str:
    """Serialize the jitted forward. ``with_points`` exports the
    reference ONNX contract — (disp, seg, points) at camera resolution
    (reference export_SOccDPT.py:96-141) — instead of the raw
    net-resolution pair."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from ..core.config import MODEL_TYPES, ModelConfig
    from ..models.soccdpt import build_model

    mcfg = ModelConfig(
        model_type=model_type, version=version, compute_dtype="bfloat16"
    )
    model = build_model(mcfg, use_pallas=use_pallas)
    _, net_w, net_h = MODEL_TYPES[model_type]

    x = jnp.zeros((batch or 1, 3, net_h, net_w), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x, deterministic=True, return_raw=True
    )
    if load:
        if load.endswith((".pth", ".pt")):
            from ..core.torch_import import (
                family_of,
                import_soccdpt,
                load_torch_state_dict,
                merge_into,
            )

            sd = load_torch_state_dict(load)
            p, s = import_soccdpt(sd, version, family_of(mcfg.backbone))
            variables = {
                "params": merge_into(jax.device_get(variables["params"]), p),
                "batch_stats": merge_into(
                    jax.device_get(variables["batch_stats"]), s
                ),
            }
        else:
            from ..core.checkpoint import restore_checkpoint

            restored = restore_checkpoint(load)
            variables = {
                "params": restored["params"],
                "batch_stats": restored.get("batch_stats", {}),
            }

    if with_points:

        def forward(inp):
            inv_d, seg, points, _ = model.apply(
                variables, inp, deterministic=True, compute_occ=False
            )
            return inv_d, seg, points

    else:

        def forward(inp):
            return model.apply(
                variables, inp, deterministic=True, return_raw=True
            )

    if batch is None:
        # dynamic batch dimension (reference exports dynamic axis 0,
        # export_SOccDPT.py:127-140)
        b = jax_export.symbolic_shape("b")[0]
        arg = jax.ShapeDtypeStruct((b, 3, net_h, net_w), jnp.float32)
    else:
        arg = jax.ShapeDtypeStruct((batch, 3, net_h, net_w), jnp.float32)

    exported = jax_export.export(jax.jit(forward))(arg)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as fh:
        fh.write(blob)
    print(f"exported {len(blob)} bytes -> {out_path}")
    return out_path


def main(argv=None):
    from ..core.config import MODEL_TYPES

    parser = argparse.ArgumentParser(description="Export SOccDPT to StableHLO")
    parser.add_argument("-v", "--version", type=int, choices=[1, 2, 3], default=3)
    parser.add_argument("-t", "--model_type", choices=list(MODEL_TYPES), required=True)
    parser.add_argument("-l", "--load", default=None)
    parser.add_argument("-o", "--out", default="exports/soccdpt.stablehlo")
    parser.add_argument(
        "--batch", type=int, default=None, help="fix batch (default: dynamic)"
    )
    parser.add_argument(
        "--with_points",
        action="store_true",
        help="export (disp, seg, points) at camera resolution like the "
        "reference's ONNX contract",
    )
    args = parser.parse_args(argv)
    export_model(
        args.model_type,
        args.version,
        args.out,
        args.load,
        args.batch,
        with_points=args.with_points,
    )


if __name__ == "__main__":
    main()
