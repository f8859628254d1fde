"""Geometry op tests: unprojection, rotation, voxelization.

The voxelization oracle is an independent numpy ``np.add.at``
implementation (the semantics of the reference's GT path,
bdd_helper.py:319-337), run per batch row.
"""
import numpy as np

from soccdpt_tpu.core.config import CameraConfig, OccupancyConfig
from soccdpt_tpu.ops.geometry import (
    get_semantic_occupancy,
    occupancy_grid_to_points,
    points_to_occupancy_grid,
    rotate_points,
    rotation_matrix,
    unproject_depth,
)

CAM = CameraConfig(fx=100.0, fy=120.0, cx=32.0, cy=20.0, width=64, height=40)
OCC = OccupancyConfig(grid_size=(16, 16, 8))


def test_unproject_principal_point_on_axis():
    depth = np.full((1, 40, 64), 5.0, np.float32)
    pts = np.asarray(unproject_depth(depth, CAM))
    # Pixel at (row=cy, col=cx) unprojects to X=Y=0, Z=depth.
    np.testing.assert_allclose(pts[0, 20, 32], [0.0, 0.0, 5.0], atol=1e-5)
    # One pixel right of cx moves X by Z/fx.
    np.testing.assert_allclose(pts[0, 20, 33, 0], 5.0 / 100.0, rtol=1e-5)


def test_rotation_roundtrip_and_orthogonality():
    r = rotation_matrix((7.0, 3.0, -12.0))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    pts = np.random.default_rng(0).standard_normal((2, 10, 3)).astype(np.float32)
    rot = rotate_points(pts, (7.0, 0.0, 0.0))
    # Norms preserved.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rot), axis=-1),
        np.linalg.norm(pts, axis=-1),
        rtol=1e-5,
    )
    # transpose=True inverts the model-path rotation for single-axis angles.
    back = rotate_points(rot, (7.0, 0.0, 0.0), transpose=True)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


def _numpy_voxelize(points, semantics, occ, num_classes, threshold=0.5):
    """Independent oracle with np.add.at per batch row."""
    B = points.shape[0]
    gx, gy, gz = occ.grid_size
    shape_m = np.asarray(occ.occupancy_shape, np.float32)
    out = np.zeros((B, gx, gy, gz, num_classes), np.float32)
    for b in range(B):
        pts = points[b]
        sem = semantics[b]
        ok = np.isfinite(pts).all(axis=1)
        pts, sem = pts[ok], sem[ok]
        ijk = (pts / shape_m * np.asarray(occ.grid_size)).astype(np.int64)
        inb = ((ijk > 0) & (ijk < np.asarray(occ.grid_size))).all(axis=1)
        ijk, sem = ijk[inb], sem[inb]
        for c in range(num_classes):
            np.add.at(out[b, ..., c], (ijk[:, 0], ijk[:, 1], ijk[:, 2]), sem[:, c])
    return out


def test_voxelize_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    B, N, C = 2, 500, 3
    shape_m = np.asarray(OCC.occupancy_shape, np.float32)
    points = (rng.random((B, N, 3)).astype(np.float32) * 1.4 - 0.2) * shape_m
    points[0, :5] = np.inf  # non-finite filtering
    semantics = rng.random((B, N, C)).astype(np.float32)
    got = np.asarray(
        points_to_occupancy_grid(points, semantics, OCC, C, mode="prob")
    )
    want = _numpy_voxelize(points, semantics, OCC, C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_voxelize_sort_route_matches_scatter_and_oracle():
    """The sort+segmented-scan route (TPU default at production point
    counts — the XLA scatter lowers to a ~40 ns/row serial loop there)
    must agree with the scatter route and the numpy oracle, including
    its custom-VJP gradient."""
    import jax

    rng = np.random.default_rng(1)
    B, N, C = 2, 700, 3
    shape_m = np.asarray(OCC.occupancy_shape, np.float32)
    points = (rng.random((B, N, 3)).astype(np.float32) * 1.4 - 0.2) * shape_m
    points[1, :7] = np.nan
    semantics = rng.random((B, N, C)).astype(np.float32)
    got = np.asarray(
        points_to_occupancy_grid(points, semantics, OCC, C, method="sort")
    )
    want = _numpy_voxelize(points, semantics, OCC, C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    w = rng.random(got.shape[1:]).astype(np.float32)

    def make_loss(method):
        def loss(s):
            g = points_to_occupancy_grid(points, s, OCC, C, method=method)
            return (g * w).sum()

        return loss

    g_sort = np.asarray(jax.grad(make_loss("sort"))(semantics))
    g_scat = np.asarray(jax.grad(make_loss("scatter"))(semantics))
    np.testing.assert_allclose(g_sort, g_scat, rtol=1e-5, atol=1e-5)


def test_voxelize_count_mode_accumulates_duplicates():
    # 10 identical points in one voxel must count 10 (the reference's
    # model-path `+=` bug would count 1; SURVEY.md §2.6).
    shape_m = np.asarray(OCC.occupancy_shape, np.float32)
    p = (np.asarray([[2, 2, 2]], np.float32) / np.asarray(OCC.grid_size)) * shape_m
    points = np.tile(p + 0.01, (1, 10, 1)).astype(np.float32)
    semantics = np.ones((1, 10, 1), np.float32)
    grid = np.asarray(points_to_occupancy_grid(points, semantics, OCC, 1, mode="count"))
    assert grid.sum() == 10.0
    assert grid[0, 2, 2, 2, 0] == 10.0


def test_voxelize_batch_rows_independent():
    shape_m = np.asarray(OCC.occupancy_shape, np.float32)
    p0 = (np.asarray([[3, 3, 3]], np.float32) / np.asarray(OCC.grid_size)) * shape_m
    p1 = (np.asarray([[5, 5, 5]], np.float32) / np.asarray(OCC.grid_size)) * shape_m
    points = np.stack([p0 + 0.01, p1 + 0.01]).astype(np.float32)
    semantics = np.ones((2, 1, 1), np.float32)
    grid = np.asarray(points_to_occupancy_grid(points, semantics, OCC, 1))
    assert grid[0, 3, 3, 3, 0] == 1.0 and grid[0, 5, 5, 5, 0] == 0.0
    assert grid[1, 5, 5, 5, 0] == 1.0 and grid[1, 3, 3, 3, 0] == 0.0


def test_get_semantic_occupancy_shapes_and_depth_inversion():
    # Identity point-cloud transform so unprojected points land in the
    # small test grid (the flagship pc_scale values are camera-specific).
    occ_simple = OccupancyConfig(
        grid_size=(16, 16, 8),
        pc_scale=(1.0, 1.0, 1.0),
        pc_shift=(2.0, 2.0, 0.0),
        correction_angle=(0.0, 0.0, 0.0),
    )
    inv_depth = np.full((1, 16, 16), 0.25, np.float32)
    seg = np.zeros((1, 3, 16, 16), np.float32)
    seg[:, 1] = 1.0
    inv_up, seg_up, points, grid = get_semantic_occupancy(
        inv_depth, seg, CAM, occ_simple, 3, compute_occ=True
    )
    assert inv_up.shape == (1, CAM.height, CAM.width)
    assert seg_up.shape == (1, 3, CAM.height, CAM.width)
    assert points.shape == (1, CAM.height, CAM.width, 3)
    assert grid.shape == (1, *occ_simple.grid_size, 3)
    # depth = 1 / inv_depth
    np.testing.assert_allclose(np.asarray(points[..., 2]), 4.0, rtol=1e-4)
    # only class 1 accumulates
    g = np.asarray(grid)
    assert g[..., 1].sum() > 0 and g[..., 0].sum() == 0 and g[..., 2].sum() == 0


def test_grid_to_points_roundtrip():
    grid = np.zeros((*OCC.grid_size, 2), np.float32)
    grid[4, 5, 6, 1] = 1.0
    pts = occupancy_grid_to_points(grid, OCC)
    assert pts.shape == (1, 4)
    assert pts[0, 3] == 1.0
    shape_m = np.asarray(OCC.occupancy_shape)
    np.testing.assert_allclose(
        pts[0, :3], np.array([4, 5, 6]) / np.asarray(OCC.grid_size) * shape_m,
        rtol=1e-5,
    )


def test_voxelize_all_nonfinite_points_gives_empty_grid():
    points = np.full((1, 10, 3), np.nan, np.float32)
    sem = np.ones((1, 10, 2), np.float32)
    grid = np.asarray(points_to_occupancy_grid(points, sem, OCC, 2))
    assert grid.sum() == 0.0


def test_get_semantic_occupancy_zero_inv_depth_finite():
    """inv_depth of 0 clamps to 1e-8 -> depth 1e8, never inf/NaN
    (reference SOccDPT.py:289-293 scrubbing)."""
    inv_depth = np.zeros((1, 8, 8), np.float32)
    seg = np.ones((1, 1, 8, 8), np.float32)
    _, _, points, _ = get_semantic_occupancy(inv_depth, seg, CAM, OCC, 1)
    assert bool(np.isfinite(np.asarray(points)).all())


def test_voxelize_folded_cz_layout_matches_grid5d():
    """layout="folded_cz" (the depth-folded channel-minor view the real
    OccupancyHead consumes; channel index c*gz + z) must equal the 5-D
    grid transposed, on every method, with matching custom-VJP grads."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    B, N, C = 2, 900, 3
    gx, gy, gz = OCC.grid_size
    shape_m = np.asarray(OCC.occupancy_shape, np.float32)
    points = (rng.random((B, N, 3)).astype(np.float32) * 1.4 - 0.2) * shape_m
    semantics = rng.random((B, N, C)).astype(np.float32)

    grid5 = np.asarray(
        points_to_occupancy_grid(points, semantics, OCC, C, method="scatter")
    )
    want = grid5.transpose(0, 1, 2, 4, 3).reshape(B, gx, gy, C * gz)
    for method in ("scatter", "sort", "pallas"):
        kw = {"interpret": True} if method == "pallas" else {}
        if method == "pallas":
            from soccdpt_tpu.ops.sorted_segment_sum import (
                segment_sum_sorted_pallas,
            )

            # interpret-mode kernel, transposed output, small blocks
            lin = jnp.asarray(
                rng.integers(0, 64, size=(256,), dtype=np.int32)
            )
            vals = jnp.asarray(rng.random((256, C)).astype(np.float32))
            out_t = np.asarray(
                segment_sum_sorted_pallas(
                    lin, vals, 64, block_k=64, block_c=64,
                    interpret=True, transposed=True,
                )
            )
            out = np.asarray(
                segment_sum_sorted_pallas(
                    lin, vals, 64, block_k=64, block_c=64, interpret=True
                )
            )
            np.testing.assert_array_equal(out_t, out.T)
            continue
        got = np.asarray(
            points_to_occupancy_grid(
                points, semantics, OCC, C, method=method, layout="folded_cz"
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4, err_msg=method)

    # the transposed custom-VJP path grads match the grid5d path
    w5 = rng.random(grid5.shape[1:]).astype(np.float32)
    # same weights in both layouts -> identical scalar losses and grads
    wf = np.ascontiguousarray(
        w5.transpose(0, 1, 3, 2).reshape(gx, gy, C * gz)
    )

    def loss5(s):
        g = points_to_occupancy_grid(points, s, OCC, C, method="sort")
        return (g * w5).sum()

    def lossf(s):
        g = points_to_occupancy_grid(
            points, s, OCC, C, method="sort", layout="folded_cz"
        )
        return (g * wf).sum()

    g5 = np.asarray(jax.grad(loss5)(semantics))
    gf = np.asarray(jax.grad(lossf)(semantics))
    np.testing.assert_allclose(g5, gf, rtol=1e-5, atol=1e-5)
