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
