"""ctypes bindings for the C++ host-pipeline kernels (native/).

Loads ``libsoccdpt_native.so`` (building it with make/g++ on first use
if the toolchain is present) and exposes numpy-facing wrappers. Every
entry point has a pure-numpy fallback so the framework works without a
compiler; ``AVAILABLE`` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsoccdpt_native.so")

_lib: Optional[ctypes.CDLL] = None


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) and os.path.isfile(
        os.path.join(_NATIVE_DIR, "soccdpt_native.cpp")
    ):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.isfile(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f32p = ctypes.POINTER(ctypes.c_float)

    lib.rgb_to_class.argtypes = [
        c_u8p, ctypes.c_int64, c_u8p, ctypes.c_int32, c_i32p,
    ]
    lib.rgb_to_bool_masks.argtypes = [
        c_u8p, ctypes.c_int64, c_u8p, ctypes.c_int32, c_u8p,
    ]
    lib.voxelize_points.argtypes = [
        c_f32p, c_i32p, ctypes.c_int64, c_f32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, c_f32p,
    ]
    lib.resize_normalize_chw.argtypes = [
        c_u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        c_f32p, c_f32p, c_f32p,
    ]
    lib.unproject_depth.argtypes = [
        c_f32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float, c_f32p,
    ]
    lib.soccdpt_native_version.restype = ctypes.c_int32
    _lib = lib
    return lib


def available() -> bool:
    return _try_load() is not None


AVAILABLE = available()


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def rgb_to_class(seg: np.ndarray, colors: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 + (C, 3) uint8 color table -> (H, W) int32."""
    seg = np.ascontiguousarray(seg, np.uint8)
    colors = np.ascontiguousarray(colors, np.uint8)
    lib = _try_load()
    h, w = seg.shape[:2]
    if lib is None:
        out = np.zeros((h, w), np.int32)
        for c in range(len(colors)):
            out[np.all(seg == colors[c], axis=-1)] = c
        return out
    out = np.zeros(h * w, np.int32)
    lib.rgb_to_class(
        _ptr(seg, ctypes.c_uint8), h * w, _ptr(colors, ctypes.c_uint8),
        len(colors), _ptr(out, ctypes.c_int32),
    )
    return out.reshape(h, w)


def rgb_to_bool_masks(seg: np.ndarray, colors: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W, C) bool."""
    seg = np.ascontiguousarray(seg, np.uint8)
    colors = np.ascontiguousarray(colors, np.uint8)
    lib = _try_load()
    h, w = seg.shape[:2]
    C = len(colors)
    if lib is None:
        out = np.zeros((h, w, C), bool)
        for c in range(C):
            out[..., c] = np.all(seg == colors[c], axis=-1)
        return out
    out = np.zeros(h * w * C, np.uint8)
    lib.rgb_to_bool_masks(
        _ptr(seg, ctypes.c_uint8), h * w, _ptr(colors, ctypes.c_uint8),
        C, _ptr(out, ctypes.c_uint8),
    )
    return out.reshape(h, w, C).astype(bool)


def voxelize_points(
    points: np.ndarray,
    semantics: np.ndarray,
    occupancy_shape: Tuple[float, float, float],
    grid_size: Tuple[int, int, int],
    num_classes: int,
) -> np.ndarray:
    """(N, 3) float32 + (N,) int32 -> (gx, gy, gz, C) float32 counts
    (np.add.at semantics, reference bdd_helper.py:319-337)."""
    points = np.ascontiguousarray(points, np.float32)
    semantics = np.ascontiguousarray(semantics, np.int32)
    gx, gy, gz = grid_size
    lib = _try_load()
    if lib is None:
        grid = np.zeros((gx, gy, gz, num_classes), np.float32)
        ok = np.isfinite(points).all(axis=1)
        pts, sem = points[ok], semantics[ok]
        ijk = (pts / np.asarray(occupancy_shape, np.float32) * np.asarray(
            grid_size
        )).astype(int)
        inb = ((ijk > 0) & (ijk < np.asarray(grid_size))).all(axis=1)
        ijk, sem = ijk[inb], sem[inb]
        valid_cls = (sem >= 0) & (sem < num_classes)
        ijk, sem = ijk[valid_cls], sem[valid_cls]
        np.add.at(grid, (ijk[:, 0], ijk[:, 1], ijk[:, 2], sem), 1)
        return grid
    grid = np.zeros((gx, gy, gz, num_classes), np.float32)
    shape = np.asarray(occupancy_shape, np.float32)
    lib.voxelize_points(
        _ptr(points, ctypes.c_float), _ptr(semantics, ctypes.c_int32),
        len(points), _ptr(shape, ctypes.c_float),
        gx, gy, gz, num_classes, _ptr(grid, ctypes.c_float),
    )
    return grid


def resize_normalize_chw(
    img: np.ndarray,
    out_hw: Tuple[int, int],
    mean=(0.5, 0.5, 0.5),
    std=(0.5, 0.5, 0.5),
) -> np.ndarray:
    """(H, W, 3) uint8 -> (3, out_h, out_w) float32, fused bilinear
    resize + normalize + transpose."""
    img = np.ascontiguousarray(img, np.uint8)
    out_h, out_w = out_hw
    lib = _try_load()
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    if lib is None:
        import cv2

        r = cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
        x = (r.astype(np.float32) / 255.0 - mean_a) / std_a
        return np.ascontiguousarray(x.transpose(2, 0, 1))
    out = np.zeros((3, out_h, out_w), np.float32)
    lib.resize_normalize_chw(
        _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1], out_h, out_w,
        _ptr(mean_a, ctypes.c_float), _ptr(std_a, ctypes.c_float),
        _ptr(out, ctypes.c_float),
    )
    return out


def unproject_depth(depth: np.ndarray, fx, fy, cx, cy) -> np.ndarray:
    """(H, W) float32 depth -> (H*W, 3) float32 points."""
    depth = np.ascontiguousarray(depth, np.float32)
    h, w = depth.shape
    lib = _try_load()
    if lib is None:
        u = np.arange(h)[:, None]
        v = np.arange(w)[None, :]
        x = (v - cx) * depth / fx
        y = (u - cy) * depth / fy
        return np.stack([x.ravel(), y.ravel(), depth.ravel()], axis=1).astype(
            np.float32
        )
    out = np.zeros((h * w, 3), np.float32)
    lib.unproject_depth(
        _ptr(depth, ctypes.c_float), h, w,
        ctypes.c_float(fx), ctypes.c_float(fy),
        ctypes.c_float(cx), ctypes.c_float(cy),
        _ptr(out, ctypes.c_float),
    )
    return out
