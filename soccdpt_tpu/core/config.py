"""Configuration dataclasses + JSON/sweep interop.

Replaces the reference's two-level config system (argparse CLI + wandb
sweep JSON, ``scripts/train_SOccDPT.py:452-548`` and ``config/*.json``)
with plain dataclasses. ``SweepConfig.load`` understands the reference's
sweep-JSON schema (``method``/``metric``/``parameters.{...}.values``) so
the 25 shipped config files translate 1:1.
"""
from __future__ import annotations

import dataclasses
import itertools
import json
import random
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional, Tuple


# ---------------------------------------------------------------------------
# Camera intrinsics (reference: YAML calib contract, bdd_helper.py:86-117)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera intrinsics, matching the reference's calib.yaml keys
    (``Camera.fx``/``fy``/``cx``/``cy``/``k1``../``width``/``height``,
    reference bdd_helper.py:86-117)."""

    fx: float = 1000.0
    fy: float = 1000.0
    cx: float = 960.0
    cy: float = 540.0
    width: int = 1920
    height: int = 1080
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0

    @property
    def dist_coef(self) -> Tuple[float, float, float, float, float]:
        return (self.k1, self.k2, self.p1, self.p2, self.k3)

    @property
    def intrinsic_matrix(self):
        import numpy as np

        return np.array(
            [
                [self.fx, 0.0, self.cx],
                [0.0, self.fy, self.cy],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float64,
        )

    @classmethod
    def from_yaml(cls, path: str) -> "CameraConfig":
        import os

        import yaml

        with open(os.path.expanduser(path), "r") as stream:
            cam = yaml.safe_load(stream)
        return cls(
            fx=float(cam["Camera.fx"]),
            fy=float(cam["Camera.fy"]),
            cx=float(cam["Camera.cx"]),
            cy=float(cam["Camera.cy"]),
            width=int(cam["Camera.width"]),
            height=int(cam["Camera.height"]),
            k1=float(cam.get("Camera.k1", 0.0)),
            k2=float(cam.get("Camera.k2", 0.0)),
            p1=float(cam.get("Camera.p1", 0.0)),
            p2=float(cam.get("Camera.p2", 0.0)),
            k3=float(cam.get("Camera.k3", 0.0)),
        )

    def to_yaml(self, path: str) -> None:
        import yaml

        doc = {
            "Camera.fx": self.fx,
            "Camera.fy": self.fy,
            "Camera.cx": self.cx,
            "Camera.cy": self.cy,
            "Camera.width": self.width,
            "Camera.height": self.height,
            "Camera.k1": self.k1,
            "Camera.k2": self.k2,
            "Camera.p1": self.p1,
            "Camera.p2": self.p2,
            "Camera.k3": self.k3,
        }
        with open(path, "w") as fh:
            yaml.safe_dump(doc, fh)


# ---------------------------------------------------------------------------
# Occupancy-grid geometry constants (reference SOccDPT.py:145-150)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OccupancyConfig:
    grid_size: Tuple[int, int, int] = (256, 256, 32)
    scale: Tuple[float, float, float] = (2.0, 2.0, 0.666)  # voxels / meter
    shift: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # meters
    pc_scale: Tuple[float, float, float] = (10000.0, 50000.0, 800.0)
    pc_shift: Tuple[float, float, float] = (55.0, -20.0, 15.0)
    correction_angle: Tuple[float, float, float] = (7.0, 0.0, 0.0)  # degrees

    @property
    def occupancy_shape(self) -> Tuple[float, float, float]:
        """Grid extent in meters (reference SOccDPT.py:175-181)."""
        return tuple(g / s for g, s in zip(self.grid_size, self.scale))


# GT-occupancy pipeline uses different point-cloud scaling
# (reference bdd_helper.py:198-205).
GT_OCCUPANCY = OccupancyConfig(
    pc_scale=(500.0, 2500.0, 200.0),
    pc_shift=(100.0, 40.0, 0.0),
)


# ---------------------------------------------------------------------------
# Model config
# ---------------------------------------------------------------------------

# model_type -> (backbone name, net_w, net_h); mirrors the dispatch tables at
# reference loader.py:37-124 and loader.py:141-272.
MODEL_TYPES: Dict[str, Tuple[str, int, int]] = {
    "dpt_beit_large_512": ("beitl16_512", 512, 512),
    "dpt_beit_large_384": ("beitl16_384", 384, 384),
    "dpt_beit_base_384": ("beitb16_384", 384, 384),
    "dpt_swin2_large_384": ("swin2l24_384", 256, 256),
    "dpt_swin2_base_384": ("swin2b24_384", 256, 256),
    "dpt_swin2_tiny_256": ("swin2t16_256", 256, 256),
    "dpt_swin_large_384": ("swinl12_384", 256, 256),
    "dpt_next_vit_large_384": ("next_vit_large_6m", 384, 384),
    "dpt_levit_224": ("levit_384", 224, 224),
    "dpt_large_384": ("vitl16_384", 384, 384),
    "dpt_hybrid_384": ("vitb_rn50_384", 384, 384),
    # Tiny model for fast unit tests on CPU (no reference equivalent).
    "dpt_swin2_test_64": ("swin2test_64", 64, 64),
}


@dataclass(frozen=True)
class ModelConfig:
    model_type: str = "dpt_swin2_tiny_256"
    version: int = 3  # SOccDPT V1 / V2 / V3
    num_classes: int = 3
    features: int = 256  # DPT fusion width
    head_features_1: Optional[int] = None  # defaults to `features`
    head_features_2: int = 32
    non_negative: bool = True
    sigmoid: bool = True  # seg activation: sigmoid vs scaled-tanh
    use_bn: bool = False  # fusion-block batchnorm (seg model forces True)
    compute_occ: bool = False
    occupancy_head: bool = False  # real 3D-conv occupancy refiner (V4 path)
    camera: CameraConfig = field(default_factory=CameraConfig)
    occupancy: OccupancyConfig = field(default_factory=OccupancyConfig)
    compute_dtype: str = "float32"  # "bfloat16" for TPU fast path

    @property
    def backbone(self) -> str:
        return MODEL_TYPES[self.model_type][0]

    @property
    def net_size(self) -> Tuple[int, int]:
        """(width, height) of the network input."""
        _, w, h = MODEL_TYPES[self.model_type]
        return (w, h)


# ---------------------------------------------------------------------------
# Train config (fields = the wandb.config fields unpacked at
# reference train_SOccDPT.py:44-106; flagship defaults from the Aug_22 sweep)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 15
    batch_size: int = 3
    learning_rate: float = 1e-5
    val_percent: float = 0.05
    save_checkpoint: bool = True
    amp: bool = False  # bf16 compute on TPU (no loss scaling needed)
    weight_decay: float = 0.0
    encoder_percentage: float = 0.5
    patchwise_percentage: float = 1.0
    # "inplace" = reference PatchWiseInplace (sequential patch steps,
    # what the reference trains with); "snapshot" = reference PatchWise
    # (every patch trained from the same start weights, batch-applied
    # at the end — reference patchwise_training/__init__.py:9-145)
    patchwise_mode: str = "inplace"
    loss_weights: Tuple[float, float] = (0.5, 0.5)  # (depth, seg)
    dataset_percentage: float = 1.0
    compute_scale_and_shift: bool = True
    sigmoid: bool = False
    load: Optional[str] = None
    load_depth: Optional[str] = None
    load_seg: Optional[str] = None
    dataset: str = "bdd"
    base_path: str = "~/Datasets/Depth_Dataset_Bengaluru"
    checkpoint_dir: str = "checkpoints"
    project_name: str = "SOccDPT"
    seed: int = 0
    # TPU-specific additions (no reference equivalent):
    # subsample GT tensors k-fold per axis on the host before transfer
    # (k^2 fewer wire bytes; SSI/BCE statistics preserved — see
    # Trainer.shard_batch). 1 = reference-exact full-resolution GT.
    gt_downscale: int = 1
    mesh_shape: Tuple[int, ...] = (1,)  # data-parallel axis sizes
    mesh_axes: Tuple[str, ...] = ("data",)
    # Tensor-parallel axis size: devices arrange as a (data, model) mesh
    # with model=tp; large weight matrices shard over "model"
    # (parallel/sharding.param_sharding_rules) and XLA inserts the ICI
    # collectives. 1 = pure data parallel (the production default at
    # this model scale, SURVEY.md §2.5).
    tp: int = 1
    # Leaves smaller than this stay replicated under tp>1 (sharding tiny
    # tensors costs more in collectives than it saves in HBM). Tests and
    # the driver dryrun lower it so tiny models still exercise sharding.
    tp_min_size: int = 2**16
    remat_backbone: bool = False  # jax.checkpoint on backbone stages
    log_histograms: bool = False  # per-leaf weight stats at eval rounds
    log_visuals: bool = True  # eval-round visualization panels


def dataclass_replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


# ---------------------------------------------------------------------------
# Sweep-JSON interop (reference config/*.json schema)
# ---------------------------------------------------------------------------


@dataclass
class SweepConfig:
    """Parsed reference sweep JSON: ``{"method": "grid"|"random",
    "metric": {...}, "parameters": {name: {"values": [...]}}}``."""

    method: str
    metric: Dict[str, Any]
    parameters: Dict[str, List[Any]]

    @classmethod
    def load(cls, path: str) -> "SweepConfig":
        with open(path, "r") as fh:
            raw = json.load(fh)
        params = {}
        for name, spec in raw.get("parameters", {}).items():
            if isinstance(spec, dict) and "values" in spec:
                params[name] = list(spec["values"])
            elif isinstance(spec, dict) and "value" in spec:
                params[name] = [spec["value"]]
            else:
                params[name] = [spec]
        return cls(
            method=raw.get("method", "grid"),
            metric=raw.get("metric", {}),
            parameters=params,
        )

    def override(self, **kw) -> None:
        for name, value in kw.items():
            self.parameters[name] = [value]

    def trials(self, count: Optional[int] = None, seed: int = 0) -> Iterator[Dict[str, Any]]:
        """Yield flat hyperparameter dicts: full cartesian product for
        ``grid``, independent uniform draws for ``random``."""
        names = sorted(self.parameters)
        if self.method == "random":
            rng = random.Random(seed)
            n = count if count is not None else 1
            for _ in range(n):
                yield {k: rng.choice(self.parameters[k]) for k in names}
        else:
            combos = itertools.product(*(self.parameters[k] for k in names))
            for i, combo in enumerate(combos):
                if count is not None and i >= count:
                    return
                yield dict(zip(names, combo))


def train_config_from_params(params: Dict[str, Any]) -> TrainConfig:
    """Build a TrainConfig from a sweep-trial dict, ignoring unknown keys."""
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    kw: Dict[str, Any] = {}
    for k, v in params.items():
        if k not in known:
            continue
        if k == "loss_weights":
            kw[k] = tuple(float(x) for x in v)
        elif k in ("load", "load_depth", "load_seg") and isinstance(v, bool):
            kw[k] = None if not v else kw.get(k)
        else:
            kw[k] = v
    return TrainConfig(**kw)
