"""Baseline-comparison harness (reference scripts/eval_others.py).

The reference wraps seven external torch-hub depth estimators (MiDaS
DPTs, monodepth2, manydepth, zerodepth, packnet) behind one interface so
all are scored with identical metrics (reference eval_others.py:42-51).
This environment has no model-hub egress, so the harness generalizes
the pattern: a *registry of depth-model adapters* — every in-tree model
type, plus arbitrary user models via ``--adapter module:function``
(the function returns ``fn(images_nchw_f32) -> disparity (B, H, W)``) —
all evaluated with the same SSI-aligned masked depth metrics.
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
from typing import Callable, Dict

import numpy as np


def builtin_adapter(model_type: str, version: int = 3, load=None) -> Callable:
    """Adapter for an in-tree SOccDPT model: returns disparity-only fn."""
    import jax
    import jax.numpy as jnp

    from ..core.config import ModelConfig
    from ..models.soccdpt import build_model

    mcfg = ModelConfig(
        model_type=model_type, version=version, compute_dtype="bfloat16"
    )
    model = build_model(mcfg)

    variables = None

    # Weights as a jit argument, not a closure: closed-over trees ship
    # with the module at compile time and overflow the remote-compile
    # transport for the big model types (see utils/timing.py).
    @jax.jit
    def forward(v, x):
        return model.apply(v, x, deterministic=True, return_raw=True)[0]

    def fn(images: np.ndarray) -> np.ndarray:
        nonlocal variables
        x = jnp.asarray(images)
        if variables is None:
            init = model.init(
                jax.random.PRNGKey(0), x[:1], deterministic=True, return_raw=True
            )
            if load:
                from ..core.checkpoint import restore_checkpoint

                restored = restore_checkpoint(load)
                init = {
                    "params": restored["params"],
                    "batch_stats": restored.get(
                        "batch_stats", init.get("batch_stats", {})
                    ),
                }
            variables = jax.device_put(init)
        return np.asarray(forward(variables, x), np.float32)

    return fn


def file_adapter(scheme: str, path: str) -> Callable:
    """Adapter for a foreign model *file* (the reference scores external
    artifacts with shared metrics, eval_others.py:42-51):

    ``stablehlo:<path>`` — a ``soccdpt-export`` artifact (serialized
    ``jax.export``); first output is disparity.
    ``onnx:<path>`` — an ONNX model via onnxruntime (optional dep;
    clear error when absent). First output is disparity.
    """
    path = os.path.expanduser(path)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if scheme == "stablehlo":
        import jax.numpy as jnp
        from jax import export as jax_export

        with open(path, "rb") as fh:
            exported = jax_export.deserialize(fh.read())

        def fn(images: np.ndarray) -> np.ndarray:
            out = exported.call(jnp.asarray(images, jnp.float32))
            disp = out[0] if isinstance(out, (tuple, list)) else out
            return np.asarray(disp, np.float32)

        return fn
    if scheme == "onnx":
        try:
            import onnxruntime as ort
        except ImportError as e:
            raise RuntimeError(
                "onnx adapter requires onnxruntime, which is not "
                "installed in this environment; export with "
                "soccdpt-export (StableHLO) and use stablehlo:<path>"
            ) from e
        sess = ort.InferenceSession(path)
        name = sess.get_inputs()[0].name

        def fn(images: np.ndarray) -> np.ndarray:
            out = sess.run(None, {name: np.asarray(images, np.float32)})
            return np.asarray(out[0], np.float32)

        return fn
    raise ValueError(f"unknown file adapter scheme {scheme!r}")


def load_adapter(spec: str) -> Callable:
    """'stablehlo:<path>' / 'onnx:<path>' / 'module.path:function'."""
    head, rest = spec.split(":", 1)
    if head in ("stablehlo", "onnx"):
        return file_adapter(head, rest)
    mod = importlib.import_module(head)
    return getattr(mod, rest)()


def evaluate_adapter(
    adapter: Callable, dataset, max_samples: int = 10
) -> Dict[str, float]:
    from ..ops.resize import resize_nchw
    from ..train.metrics import ssi_aligned_depth_metrics

    sums: Dict[str, list] = {}
    n = min(max_samples, len(dataset))
    for i in range(n):
        s = dataset[i]
        disp = adapter(s["image"][None])
        gt = np.asarray(s["disparity"], np.float32)[None]
        mask = np.asarray(s["mask_disp"], bool)[None]
        pred = np.asarray(
            resize_nchw(disp.astype(np.float32), gt.shape[-2:], "bicubic", False)
        )
        m = ssi_aligned_depth_metrics(gt, pred, mask)
        for k, v in m.as_dict().items():
            sums.setdefault(k, []).append(v)
    return {k: float(np.mean(v)) for k, v in sums.items()}


def main(argv=None):
    from ..core.config import TrainConfig
    from .train import build_datasets

    parser = argparse.ArgumentParser(description="Compare depth baselines")
    parser.add_argument(
        "-m",
        "--models",
        nargs="+",
        default=["dpt_swin2_tiny_256"],
        help="in-tree model types and/or module:fn adapter specs",
    )
    parser.add_argument("-dt", "--dataset", choices=["bdd", "idd"], default="bdd")
    parser.add_argument(
        "-b",
        "--base_path",
        default=os.path.expanduser("~/Datasets/Depth_Dataset_Bengaluru"),
    )
    parser.add_argument("--num_samples", type=int, default=10)
    args = parser.parse_args(argv)

    tcfg = TrainConfig(dataset=args.dataset, base_path=args.base_path)
    # transforms keyed by the first in-tree model; adapters receive the
    # same preprocessed input, like the reference's shared interface
    first = next((m for m in args.models if ":" not in m), "dpt_swin2_tiny_256")
    dataset, _, _ = build_datasets(tcfg, first)

    for spec in args.models:
        adapter = (
            load_adapter(spec) if ":" in spec else builtin_adapter(spec)
        )
        metrics = evaluate_adapter(adapter, dataset, args.num_samples)
        print(json.dumps({"model": spec, **metrics}))


if __name__ == "__main__":
    main()
