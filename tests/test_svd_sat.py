"""SVD-compressed SAT: factorization quality, MXU reconstruction, reduced
-SAT sampling path."""

import jax.numpy as jnp
import numpy as np

from foveax.core import golden
from foveax.core.logrect import make_grid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat
from foveax.core.svd_sat import (
    compress_sat,
    create_reduced_sat,
    reconstruct_sat,
    sample_from_reduced_sat,
)


def test_full_rank_reconstruction_is_exact(small_frame):
    sat = build_sat(jnp.asarray(small_frame))
    h = small_frame.shape[0]
    svd = compress_sat(sat, rank=h)  # full rank
    rec = np.asarray(reconstruct_sat(svd))
    ref = np.asarray(sat).astype(np.float64)
    rel = np.abs(rec - ref).max() / ref.max()
    assert rel < 1e-4, rel


def test_low_rank_reconstruction_close(small_frame):
    sat = build_sat(jnp.asarray(small_frame))
    svd = compress_sat(sat, rank=30)
    rec = np.asarray(reconstruct_sat(svd))
    ref = np.asarray(sat).astype(np.float64)
    # SATs are extremely low-rank-friendly (smooth integral surfaces);
    # rank 30 + 8-bit residual should land within a small relative error.
    rel = np.abs(rec - ref).mean() / ref.mean()
    assert rel < 0.02, rel


def test_reduced_sat_sampling_approximates_direct(small_frame):
    h, w, _ = small_frame.shape
    grid = make_grid(24, 16, w, h)
    center = jnp.asarray([0.5, 0.5], jnp.float32)
    sat = build_sat(jnp.asarray(small_frame))

    direct = np.asarray(sample_rect_from_sat(sat, grid, center, wrap_x=False))

    svd = compress_sat(sat, rank=h)  # exact factorization isolates the path
    reduced_sat = create_reduced_sat(svd, grid, center)
    assert reduced_sat.shape == (17, 25, 5)
    out = np.asarray(sample_from_reduced_sat(reduced_sat))
    assert out.shape == (16, 24, 3)

    # Interior texels (away from the validity/edge-handling differences of
    # the two kernels) must closely match the direct SAT sampling.
    a = out[4:12, 6:18].astype(np.int32)
    b = direct[4:12, 6:18].astype(np.int32)
    assert np.abs(a - b).mean() <= 2.0


def test_reduced_sat_position_channels(small_frame):
    h, w, _ = small_frame.shape
    grid = make_grid(24, 16, w, h)
    center = (0.5, 0.5)
    sat = build_sat(jnp.asarray(small_frame))
    svd = compress_sat(sat, rank=8)
    red = np.asarray(
        create_reduced_sat(svd, grid, jnp.asarray(center, jnp.float32))
    )
    dense = golden.grid_dense(24, 16, w, h)
    cx = int(np.float32(center[0]) * w)
    cy = int(np.float32(center[1]) * h)
    # Node (8, 12) is the grid center: position channels = clamped coords.
    kx, ky = 12, 8
    assert red[ky, kx, 3] == np.clip(cx + dense[ky, kx, 0], 0, w - 1)
    assert red[ky, kx, 4] == np.clip(cy + dense[ky, kx, 1], 0, h - 1)


def test_reconstruction_matches_float64_golden(small_frame):
    from foveax.core import golden
    from foveax.core.sat import build_sat
    from foveax.core.svd_sat import compress_sat, reconstruct_sat

    sat = build_sat(jnp.asarray(small_frame))
    svd = compress_sat(sat, rank=8)
    dev = np.asarray(reconstruct_sat(svd)).astype(np.float64)
    ref = golden.reconstruct_sat_svd(
        svd.u, svd.s, svd.v, svd.residual_q, svd.ranges
    )
    # f32 matmul vs f64: relative agreement on SAT-magnitude values.
    denom = np.maximum(np.abs(ref), 1.0)
    assert (np.abs(dev - ref) / denom).max() < 1e-4
