"""Parity tests: ops.resize vs torch.nn.functional.interpolate.

torch (CPU) is the oracle for the exact interpolation semantics the
reference relies on (SURVEY.md §7.3 risk #2).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from soccdpt_tpu.ops.resize import resize_hw, resize_nchw, upsample2x_hw


def _torch_resize(x_nchw, size, mode, align_corners):
    t = torch.from_numpy(x_nchw)
    if mode == "nearest":
        out = F.interpolate(t, size=size, mode="nearest")
    else:
        out = F.interpolate(t, size=size, mode=mode, align_corners=align_corners)
    return out.numpy()


CASES = [
    # (in_hw, out_hw, mode, align_corners)
    ((16, 16), (32, 32), "bilinear", True),   # fusion 2x upsample
    ((8, 8), (16, 16), "bilinear", True),
    ((13, 17), (29, 31), "bilinear", True),
    ((16, 16), (32, 32), "bilinear", False),
    ((32, 32), (27, 54), "bicubic", False),   # output resize semantics
    ((16, 16), (40, 40), "bicubic", True),
    ((16, 16), (40, 56), "nearest", False),   # seg upsample
    ((33, 17), (8, 8), "bilinear", False),    # downscale
    ((32, 32), (9, 9), "bicubic", False),
]


@pytest.mark.parametrize("in_hw,out_hw,mode,ac", CASES)
def test_resize_matches_torch(in_hw, out_hw, mode, ac):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw), dtype=np.float32)
    want = _torch_resize(x, out_hw, mode, ac)

    got_nchw = np.asarray(resize_nchw(x, out_hw, mode, ac))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-5, atol=1e-5)

    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    got_nhwc = np.asarray(resize_hw(x_nhwc, out_hw, mode, ac))
    np.testing.assert_allclose(
        np.transpose(got_nhwc, (0, 3, 1, 2)), want, rtol=1e-5, atol=1e-5
    )


def test_upsample2x_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    want = _torch_resize(x, (16, 16), "bilinear", True)
    got = upsample2x_hw(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-5, atol=1e-5
    )


def test_identity_passthrough():
    x = np.ones((1, 5, 5, 2), np.float32)
    out = resize_hw(x, (5, 5), "bicubic", False)
    assert out is x


def test_resize_matrix_rows_are_partitions_of_unity():
    """Interpolation weights must sum to 1 per output pixel (all modes)."""
    from soccdpt_tpu.ops.resize import _resize_matrix

    for method in ("nearest", "bilinear", "bicubic"):
        for ac in (False, True):
            m = _resize_matrix(17, 40, method, ac)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
            m = _resize_matrix(40, 9, method, ac)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
