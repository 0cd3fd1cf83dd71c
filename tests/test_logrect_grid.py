"""Grid math: JAX float32 separable grid vs NumPy float64 dense golden."""

import numpy as np

from foveax.core import golden
from foveax.core.logrect import make_grid, make_point_grid


def test_grid_matches_golden_1080p_to_reduced():
    # Grids are precomputed in float64 on host -> exact match expected.
    g = make_grid(1072, 608, 1920, 1080)
    dense = np.asarray(g.dense())
    ref = golden.grid_dense(1072, 608, 1920, 1080)
    np.testing.assert_array_equal(dense, ref)


def test_grid_small_exact():
    g = make_grid(48, 32, 96, 64)
    dense = np.asarray(g.dense())
    ref = golden.grid_dense(48, 32, 96, 64)
    np.testing.assert_array_equal(dense, ref)


def test_grid_is_separable_and_antisymmetricish():
    g = make_grid(64, 64, 128, 128)
    gx = np.asarray(g.gx, dtype=np.int64)
    # Monotone non-decreasing deltas across the axis.
    assert (np.diff(gx) >= 0).all()
    # Center of the grid maps near zero offset.
    assert abs(int(gx[33])) <= 1


def test_point_grid_matches_raw_delta():
    g = make_point_grid(48, 32, 96, 64)
    u = np.arange(48) - 24
    ref = golden.delta64(u, 48, 96).astype(np.int16)
    np.testing.assert_array_equal(np.asarray(g.gx), ref)


def test_grid_dtype_and_shapes():
    g = make_grid(1072, 608, 1920, 1080)
    assert g.gx.shape == (1073,)
    assert g.gy.shape == (609,)
    assert str(g.gx.dtype) == "int16"
