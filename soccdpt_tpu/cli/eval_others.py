"""Baseline-comparison harness (reference scripts/eval_others.py).

The reference wraps seven external torch-hub depth estimators (MiDaS
DPTs, monodepth2, manydepth, zerodepth, packnet) behind one interface so
all are scored with identical metrics (reference eval_others.py:42-51).
The registry here covers all of them (``EXTERNAL_BASELINES``,
hub-gated: weights load lazily and a clear RuntimeError is raised when
hub/network/package is unavailable — this environment has no egress)
plus everything the reference cannot score: every in-tree model type,
exported artifacts (``stablehlo:<path>`` / ``onnx:<path>``), and
arbitrary user models via ``module.path:function`` adapter specs (the
function returns ``fn(images_nchw_f32) -> disparity (B, H, W)``) — all
evaluated with the same SSI-aligned masked depth metrics.
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


# ---------------------------------------------------------------------------
# External torch-hub baselines — the reference's seven wrappers
# (reference eval_others.py:42-51, 71-200). Every adapter is hub-gated:
# it imports torch and loads weights lazily on first call and raises a
# clear RuntimeError when the hub/network/package is unavailable (this
# environment has no egress). Each wrapper owns its preprocessing, like
# the reference's per-model ``self.transform``; adapters here consume
# RAW uint8 HWC frames (``wants_raw``) rather than SOccDPT-normalized
# tensors.
# ---------------------------------------------------------------------------

EXTERNAL_BASELINES = {
    # midas family (reference eval_others.py:71-118)
    "DPT_SwinV2_T_256": {"kind": "midas", "transform": "swin256_transform"},
    # NOTE the reference applies swin256_transform to Hybrid/Large too
    # (eval_others.py:90-118) — that is the wrong normalization for
    # those models (MiDaS ships dpt_transform for them); we use the
    # correct one rather than replicate the defect (SURVEY.md §2.6).
    "DPT_Hybrid": {"kind": "midas", "transform": "dpt_transform"},
    "DPT_Large": {"kind": "midas", "transform": "dpt_transform"},
    # monodepth2 / manydepth (reference eval_others.py:120-155)
    "monodepth2": {"kind": "monodepth2", "model_name": "mono_640x192"},
    "manydepth": {
        "kind": "manydepth",
        "model_name": "KITTI_HR_1024_320",
        "intrinsics_json_path": "media/manydepth/intrinsics.json",
    },
    # TRI-ML/vidar models output DEPTH -> invert to disparity
    # (reference eval_others.py:157-199, 228-241: inv_depth.pow_(-1))
    "zerodepth": {"kind": "vidar", "entry": "ZeroDepth", "scale": 0.5},
    "packnet": {"kind": "vidar", "entry": "PackNet", "resize": (640, 384)},
}


def _require_torch(name: str):
    try:
        import torch  # noqa: F401

        return torch
    except ImportError as e:  # pragma: no cover - torch is baked in here
        raise RuntimeError(f"external baseline {name!r} requires torch") from e


def _hub_load(torch, name, *args, **kwargs):
    """torch.hub.load with a clean failure when the hub is unreachable."""
    try:
        return torch.hub.load(*args, **kwargs)
    except Exception as e:
        raise RuntimeError(
            f"external baseline {name!r} needs torch.hub access "
            f"({args[0]}), which is unavailable here: {e}"
        ) from e


def external_adapter(name: str, camera=None) -> Callable:
    """Adapter for one of the reference's external baselines.

    Returns ``fn(raw_hwc_uint8) -> disparity (1, H', W') float32``;
    the fn carries ``wants_raw = True`` so the harness feeds raw frames
    (each wrapper owns its preprocessing, like the reference's
    per-model ``self.transform``).
    """
    spec = EXTERNAL_BASELINES[name]
    torch = _require_torch(name)
    state: Dict[str, object] = {}
    kind = spec["kind"]

    def ensure_loaded():
        if "model" in state:
            return
        if kind == "midas":
            state["model"] = _hub_load(
                torch, name, "intel-isl/MiDaS", name
            ).eval()
            transforms = _hub_load(
                torch, name, "intel-isl/MiDaS", "transforms"
            )
            state["transform"] = getattr(transforms, spec["transform"])
        elif kind == "monodepth2":
            try:
                from monodepth2 import monodepth2
            except ImportError as e:
                raise RuntimeError(
                    "baseline 'monodepth2' requires the monodepth2 "
                    "package (github.com/nianticlabs/monodepth2 wrapper), "
                    "not installed here"
                ) from e
            state["model"] = monodepth2(model_name=spec["model_name"])
        elif kind == "manydepth":
            try:
                from manydepth import manydepth
            except ImportError as e:
                raise RuntimeError(
                    "baseline 'manydepth' requires the manydepth package, "
                    "not installed here"
                ) from e
            state["model"] = manydepth(
                model_name=spec["model_name"],
                intrinsics_json_path=spec["intrinsics_json_path"],
            )
        elif kind == "vidar":
            state["model"] = _hub_load(
                torch,
                name,
                "TRI-ML/vidar",
                spec["entry"],
                pretrained=True,
                trust_repo=True,
            ).eval()
        else:  # pragma: no cover
            raise ValueError(kind)

    def _resize_hwc(img: np.ndarray, wh) -> np.ndarray:
        import cv2

        return cv2.resize(img, tuple(wh))  # cv2 dsize = (W, H)

    def fn(raw: np.ndarray) -> np.ndarray:
        """raw: (H, W, 3) uint8 RGB frame."""
        ensure_loaded()
        with torch.no_grad():
            if kind == "midas":
                t = state["transform"](np.asarray(raw))
                inv = state["model"](t)
                return np.asarray(inv, np.float32).reshape(
                    1, *inv.shape[-2:]
                )
            if kind == "monodepth2":
                img = _resize_hwc(np.asarray(raw, np.uint8), (640, 192))
                disp = np.asarray(state["model"].eval(img), np.float32)
                return disp[None, :, :, 0]
            if kind == "manydepth":
                img = _resize_hwc(np.asarray(raw, np.uint8), (1024, 320))
                disp = np.asarray(state["model"].eval(img, img), np.float32)
                return disp[None]
            # vidar family: normalized CHW in, DEPTH out -> invert
            img = np.asarray(raw, np.float32)
            if "scale" in spec:
                s = spec["scale"]
                img = _resize_hwc(
                    img.astype(np.uint8),
                    (int(img.shape[1] * s), int(img.shape[0] * s)),
                ).astype(np.float32)
            else:
                img = _resize_hwc(img.astype(np.uint8), spec["resize"]).astype(
                    np.float32
                )
            x = torch.tensor(img.transpose(2, 0, 1)[None] / 255.0)
            if spec["entry"] == "ZeroDepth":
                cam = camera
                if cam is None:
                    from ..core.config import CameraConfig

                    cam = CameraConfig()
                k = np.asarray(
                    [
                        [cam.fx, 0.0, cam.cx],
                        [0.0, cam.fy, cam.cy],
                        [0.0, 0.0, 1.0],
                    ],
                    np.float32,
                ) * spec["scale"]
                k[2, 2] = 1.0
                intr = torch.tensor(k[None])
                depth = state["model"](x, intr).squeeze(0)
            else:
                depth = state["model"](x)[0].squeeze(0)
            depth = np.asarray(depth, np.float32).reshape(1, *x.shape[-2:])
            return 1.0 / np.maximum(depth, 1e-8)

    fn.wants_raw = True
    fn.baseline_name = name
    return fn


def evaluate_adapter(
    adapter: Callable, dataset, max_samples: int = 10
) -> Dict[str, float]:
    from ..ops.resize import resize_nchw
    from ..train.metrics import ssi_aligned_depth_metrics

    sums: Dict[str, list] = {}
    n = min(max_samples, len(dataset))
    for i in range(n):
        s = dataset[i]
        if getattr(adapter, "wants_raw", False):
            # external baselines own their preprocessing (reference
            # eval_others.py per-model self.transform): raw uint8 HWC in
            disp = adapter(np.asarray(s["image_raw"]))
        else:
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
    parser.add_argument(
        "--list",
        action="store_true",
        help="print the adapter registry (in-tree model types, external "
        "hub baselines, file schemes) and exit",
    )
    args = parser.parse_args(argv)

    if args.list:
        from ..core.config import MODEL_TYPES

        print(json.dumps({
            "in_tree": sorted(MODEL_TYPES),
            "external": sorted(EXTERNAL_BASELINES),
            "file_schemes": ["stablehlo:<path>", "onnx:<path>"],
            "custom": "module.path:function",
        }, indent=2))
        return

    tcfg = TrainConfig(dataset=args.dataset, base_path=args.base_path)
    # transforms keyed by the first in-tree model; adapters receive the
    # same preprocessed input, like the reference's shared interface
    first = next((m for m in args.models if ":" not in m), "dpt_swin2_tiny_256")
    dataset, _, _ = build_datasets(tcfg, first)

    from .train import dataset_camera

    for spec in args.models:
        if spec in EXTERNAL_BASELINES:
            adapter = external_adapter(spec, camera=dataset_camera(dataset))
        elif ":" in spec:
            adapter = load_adapter(spec)
        else:
            adapter = builtin_adapter(spec)
        metrics = evaluate_adapter(adapter, dataset, args.num_samples)
        print(json.dumps({"model": spec, **metrics}))


if __name__ == "__main__":
    main()
