"""Synthetic fixture trees matching the BDD / IDD on-disk contracts.

BDD and IDD are not public downloads; tests and smoke-training run on
generated fixture trees that honor the exact directory contracts
(reference bdd_helper.py:67-84 and anue_labels.py:799-829) — SURVEY.md
§4's test plan and §7.3 risk #6.
"""
from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np

from ..core.config import CameraConfig
from .anue_labels import LABELS
from .bdd import class_2_color


def _scene(rng, width, height, num_boxes=4) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Procedural street-ish scene: (rgb u8, seg_rgb u8, disparity u8)."""
    rgb = rng.integers(40, 216, (height, width, 3), dtype=np.uint8)
    seg = np.zeros((height, width, 3), np.uint8)  # class 0 = black bg
    # horizontal disparity ramp: nearer at the bottom
    ramp = np.linspace(8, 200, height, dtype=np.float32)[:, None]
    disparity = np.broadcast_to(ramp, (height, width)).copy()
    for _ in range(num_boxes):
        cls = int(rng.integers(1, 3))
        w = int(rng.integers(width // 8, width // 3))
        h = int(rng.integers(height // 8, height // 3))
        x0 = int(rng.integers(0, width - w))
        y0 = int(rng.integers(height // 2, height - h)) if height - h > height // 2 else 0
        color = class_2_color[cls]
        seg[y0 : y0 + h, x0 : x0 + w] = color
        rgb[y0 : y0 + h, x0 : x0 + w] = color
        disparity[y0 : y0 + h, x0 : x0 + w] = float(rng.integers(60, 250))
    return rgb, seg, np.clip(disparity, 1, 255).astype(np.uint8)


def make_bdd_fixture(
    base_path: str,
    sequences: Sequence[str] = ("1000000000001", "1000000000002"),
    frames_per_seq: int = 3,
    width: int = 128,
    height: int = 96,
    seed: int = 0,
) -> str:
    """Create a miniature Depth_Dataset_Bengaluru tree; returns calib path."""
    import cv2

    rng = np.random.default_rng(seed)
    camera = CameraConfig(
        fx=width * 0.9,
        fy=width * 0.9,
        cx=width / 2,
        cy=height / 2,
        width=width,
        height=height,
    )
    calib_dir = os.path.join(base_path, "calibration", "pocoX3")
    os.makedirs(calib_dir, exist_ok=True)
    calib_path = os.path.join(calib_dir, "calib.yaml")
    camera.to_yaml(calib_path)

    for seq in sequences:
        seq_dir = os.path.join(base_path, seq)
        for sub in ("rgb_img", "depth_img", "seg_img"):
            os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
        rows = ["index,Timestamp"]
        for i in range(frames_per_seq):
            ts = int(seq) + i * 33
            rgb, seg, disp = _scene(rng, width, height)
            cv2.imwrite(os.path.join(seq_dir, "rgb_img", f"{ts}.png"), rgb)
            cv2.imwrite(os.path.join(seq_dir, "seg_img", f"{ts}.png"), seg)
            cv2.imwrite(os.path.join(seq_dir, "depth_img", f"{ts}.png"), disp)
            rows.append(f"{i},{ts}")
        with open(os.path.join(seq_dir, f"{seq}.csv"), "w") as fh:
            fh.write("\n".join(rows) + "\n")
    return calib_path


def make_idd_fixture(
    base_path: str,
    folders_per_split: int = 2,
    frames_per_folder: int = 2,
    width: int = 128,
    height: int = 96,
    level_id: str = "level1Ids",
    seed: int = 0,
) -> str:
    """Create a miniature IDD_Segmentation tree; returns base_path."""
    import cv2

    rng = np.random.default_rng(seed)
    # draw from ids valid for the level: use level1Id/level3Id/level4Id
    attr = {
        "level1Ids": "level1Id",
        "level3Ids": "level3Id",
        "level4Ids": "level4Id",
    }[level_id]
    valid_ids = sorted({getattr(l, attr) for l in LABELS if getattr(l, attr) != 255})

    for split in ("train", "val"):
        for fi in range(folders_per_split):
            folder = str(fi)
            left = os.path.join(base_path, "leftImg8bit", split, folder)
            fine = os.path.join(base_path, "gtFine", split, folder)
            depth = os.path.join(base_path, "depth", split, folder)
            for d in (left, fine, depth):
                os.makedirs(d, exist_ok=True)
            for i in range(frames_per_folder):
                stem = f"{split}_{folder}_{i:06d}"
                rgb, _, disp = _scene(rng, width, height)
                ids = rng.choice(valid_ids, size=(height, width)).astype(np.uint8)
                cv2.imwrite(os.path.join(left, stem + "_leftImg8bit.png"), rgb)
                cv2.imwrite(
                    os.path.join(fine, f"{stem}_gtFine_label{level_id}.png"), ids
                )
                cv2.imwrite(os.path.join(depth, stem + "_leftImg8bit.png"), disp)
    return base_path


def make_selfconsistent_bdd_fixture(
    base_path: str,
    model_type: str = "dpt_swin2_tiny_256",
    version: int = 3,
    frames_per_seq: int = 8,
    width: int = 1024,
    height: int = 768,
    seed: int = 0,
) -> str:
    """BDD fixture whose GT disparity is the frozen base model's OWN
    predicted inverse depth (round 5).

    On the procedural fixtures above, occupancy-head training is
    signal-free: the GT grids are voxelized from disparity that carries
    no mutual information with the random-init base model's features,
    so val IoU sits at the predict-all-positive floor no matter how the
    head trains (TRAIN_BENCH.jsonl, tag occ_iou_train). This fixture
    manufactures the signal instead of pretending it exists: it runs
    the SAME deterministic frozen base the occupancy trainer will use
    (``model.init(PRNGKey(0))``, cli/train_occupancy.py) and writes its
    predicted inverse depth back as the fixture's depth_img PNGs, so
    the GT grid becomes a deterministic, spatially local transform of
    the head's input grid. Occupancy training on this fixture MUST move
    IoU above the predict-all baseline if the stack (GT pipeline ->
    voxelizer -> 3D head -> weighted BCE -> IoU) learns — measured
    3.0x above it on the flagship (PERF.md round 5). Disparity is
    written uint16 when the fixture's focal length (0.9 * width) needs
    values > 255 to keep depth inside the GT_OCCUPANCY volume.
    Reference counterpart: none (the reference's iou_3D is hardcoded
    0.0, utils/__init__.py:504).
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from ..core.config import ModelConfig
    from ..models.soccdpt import build_model
    from .bdd import BDDSequence
    from .transforms import load_transforms

    sequences = ("1000000000001", "1000000000002")
    calib = make_bdd_fixture(
        base_path,
        sequences=sequences,
        frames_per_seq=frames_per_seq,
        width=width,
        height=height,
        seed=seed,
    )

    seq0 = BDDSequence(os.path.join(base_path, sequences[0]), calib)
    camera = seq0.camera
    mcfg = ModelConfig(
        model_type=model_type,
        version=version,
        compute_occ=True,
        occupancy_head=True,
        compute_dtype="bfloat16",
        camera=camera,
    )
    model = build_model(mcfg)
    transform, _, _ = load_transforms(model_type)
    target_size = (camera.width, camera.height)

    def net_input(rgb_frame):
        rgb = cv2.resize(rgb_frame, target_size)
        return transform({"image": rgb.astype(np.float32)})["image"]

    x0 = jnp.asarray(net_input(seq0[0]["rgb_frame"])[None])
    variables = model.init(jax.random.PRNGKey(0), x0, compute_occ=True)

    @jax.jit
    def predict_inv_depth(x):
        out = model.apply(variables, x, deterministic=True, return_raw=True)
        return out[0]

    # Map predicted inverse depth onto the disparity range whose
    # depth = baseline * f / disparity span matches the 128x96
    # procedural fixture's ([0.0046, 0.144] — what GT_OCCUPANCY's
    # constants keep inside the grid volume).
    bf = 1.0e-2 * camera.fx
    disp_lo, disp_hi = bf / 0.144, bf / 0.0046
    for seq_name in sequences:
        seq = BDDSequence(os.path.join(base_path, seq_name), calib)
        for i in range(len(seq)):
            frame = seq[i]
            inv = np.asarray(
                predict_inv_depth(jnp.asarray(net_input(frame["rgb_frame"])[None]))
            )[0].astype(np.float32)
            lo, hi = float(inv.min()), float(inv.max())
            disp = (inv - lo) / max(hi - lo, 1e-9) * (disp_hi - disp_lo) + disp_lo
            disp = cv2.resize(
                disp, target_size, interpolation=cv2.INTER_LINEAR
            )
            path = os.path.join(
                base_path, seq_name, "depth_img", f"{frame['timestamp']}.png"
            )
            if disp_hi > 255:
                cv2.imwrite(path, np.clip(disp, 1, 65535).astype(np.uint16))
            else:
                cv2.imwrite(path, np.clip(disp, 1, 255).astype(np.uint8))
    return calib
