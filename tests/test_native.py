"""C++ host-kernel tests: native vs pure-numpy fallback equivalence."""
import ctypes

import numpy as np
import pytest

from soccdpt_tpu import native


def _numpy_fallback(fn_name, *args, **kw):
    """Call the module-level numpy fallback path by hiding the lib."""
    saved = native._lib
    native._lib = None
    saved_loader = native._try_load
    native._try_load = lambda: None
    try:
        return getattr(native, fn_name)(*args, **kw)
    finally:
        native._lib = saved
        native._try_load = saved_loader


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@requires_native
def test_rgb_to_class_matches_numpy():
    rng = np.random.default_rng(0)
    colors = np.array([(0, 0, 0), (0, 0, 142), (220, 20, 60)], np.uint8)
    seg = colors[rng.integers(0, 3, (37, 53))]
    seg[0, 0] = (7, 7, 7)  # unknown color -> class 0
    got = native.rgb_to_class(seg, colors)
    want = _numpy_fallback("rgb_to_class", seg, colors)
    np.testing.assert_array_equal(got, want)


@requires_native
def test_rgb_to_bool_masks_matches_numpy():
    rng = np.random.default_rng(1)
    colors = np.array([(0, 0, 0), (10, 20, 30)], np.uint8)
    seg = colors[rng.integers(0, 2, (16, 24))]
    got = native.rgb_to_bool_masks(seg, colors)
    want = _numpy_fallback("rgb_to_bool_masks", seg, colors)
    np.testing.assert_array_equal(got, want)


@requires_native
def test_voxelize_matches_numpy():
    rng = np.random.default_rng(2)
    pts = (rng.random((5000, 3)).astype(np.float32) * 1.2 - 0.1) * 8.0
    pts[:20] = np.inf
    sem = rng.integers(0, 3, 5000).astype(np.int32)
    args = (pts, sem, (8.0, 8.0, 8.0), (16, 16, 8), 3)
    got = native.voxelize_points(*args)
    want = _numpy_fallback("voxelize_points", *args)
    np.testing.assert_allclose(got, want)


@requires_native
def test_resize_normalize_shapes_and_range():
    rng = np.random.default_rng(3)
    img = (rng.random((100, 160, 3)) * 255).astype(np.uint8)
    out = native.resize_normalize_chw(img, (64, 96))
    assert out.shape == (3, 64, 96)
    # normalized with mean/std 0.5 -> values in [-1, 1]
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    # identity-size resize reproduces the exact pixels
    out2 = native.resize_normalize_chw(img, (100, 160))
    want = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out2, want.transpose(2, 0, 1), atol=1e-5)


@requires_native
def test_unproject_matches_numpy():
    d = np.abs(np.random.default_rng(4).standard_normal((24, 32))).astype(
        np.float32
    )
    got = native.unproject_depth(d, 100.0, 120.0, 16.0, 12.0)
    want = _numpy_fallback("unproject_depth", d, 100.0, 120.0, 16.0, 12.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
