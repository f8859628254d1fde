"""soccdpt_tpu — TPU-native monocular 3D semantic occupancy prediction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
AdityaNG/SOccDPT (see SURVEY.md): one transformer backbone feeds a
DPT-style fusion decoder with dual depth/segmentation heads; camera
intrinsics unproject predicted inverse depth into a 3D point cloud, and
per-class semantics are voxelized into a (256, 256, 32, C) occupancy grid.

Subpackages
-----------
core      configs, checkpointing, torch-weight import
parallel  device mesh + sharding rules (dp/tp over ICI)
ops       TPU compute ops: resize, geometry, voxelize, Pallas attention
models    backbones (Swin2/ViT/BEiT/...), DPT decoder, SOccDPT V1/V2/V3
data      dataset contracts (BDD/IDD), transforms, synthetic fixtures
train     losses, metrics, patchwise masked-grad training, trainer
utils     timing, logging, visualization
cli       train / eval / export / bench entry points
"""

__version__ = "0.1.0"

__all__ = [
    "CameraConfig",
    "ModelConfig",
    "OccupancyConfig",
    "TrainConfig",
    "Trainer",
    "build_model",
    "make_serving_fn",
]


def __getattr__(name):
    """Lazy top-level API (keeps `import soccdpt_tpu` jax-free)."""
    if name in ("CameraConfig", "ModelConfig", "OccupancyConfig", "TrainConfig"):
        from .core import config

        return getattr(config, name)
    if name == "build_model":
        from .models.soccdpt import build_model

        return build_model
    if name == "Trainer":
        from .train.trainer import Trainer

        return Trainer
    if name == "make_serving_fn":
        from .serving import make_serving_fn

        return make_serving_fn
    raise AttributeError(name)
