"""Pallas kernels: interpret-mode parity on CPU (compiled-mode parity and
perf run on real TPU via bench/verification)."""

import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core.sat import build_sat
from foveax.kernels.scan2d import build_sat_pallas


@pytest.mark.parametrize("shape,block", [((64, 256, 3), 8), ((40, 128, 3), 8)])
def test_scan2d_interpret_parity(rng, shape, block):
    f = jnp.asarray(rng.integers(0, 256, size=shape, dtype=np.uint8))
    a = np.asarray(build_sat_pallas(f, block_rows=block, interpret=True))
    b = np.asarray(build_sat(f))
    np.testing.assert_array_equal(a, b)


def test_scan2d_int8_interpret_parity(rng, monkeypatch):
    """FOVEAX_SCAN_INT8: the s8 triangular-scan dot (sign-bit shift +
    constant per-lane correction) must be bit-identical — including
    extreme pixel values at both s8 range ends."""
    monkeypatch.setenv("FOVEAX_SCAN_INT8", "1")
    # The knob is read at trace time: drop any cached non-int8 trace for
    # these shapes, and drop the int8 traces afterwards so later tests
    # at shared shapes re-trace with the knob off.
    build_sat_pallas.clear_cache()
    try:
        f = jnp.asarray(
            rng.integers(0, 256, size=(64, 256, 3), dtype=np.uint8)
        )
        f = f.at[0, :, :].set(255).at[1, :, :].set(0)
        a = np.asarray(build_sat_pallas(f, block_rows=8, interpret=True))
        b = np.asarray(build_sat(f))
        np.testing.assert_array_equal(a, b)
    finally:
        build_sat_pallas.clear_cache()


def test_scan2d_block_rows_fallback(rng):
    # H=40 not divisible by 64 -> internal fallback divisor.
    f = jnp.asarray(rng.integers(0, 256, size=(40, 128, 3), dtype=np.uint8))
    a = np.asarray(build_sat_pallas(f, block_rows=64, interpret=True))
    b = np.asarray(build_sat(f))
    np.testing.assert_array_equal(a, b)


def test_scan2d_rejects_unaligned_width(rng):
    f = jnp.asarray(rng.integers(0, 256, size=(16, 100, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        build_sat_pallas(f, interpret=True)


def test_scan2d_carry_across_many_blocks(rng):
    """Column carry must accumulate across >2 grid steps."""
    f = jnp.asarray(rng.integers(0, 256, size=(64, 128, 3), dtype=np.uint8))
    a = np.asarray(build_sat_pallas(f, block_rows=8, interpret=True))
    b = np.asarray(build_sat(f))
    np.testing.assert_array_equal(a, b)


def test_scan2d_rejects_block_unfriendly_height(rng):
    f = jnp.asarray(rng.integers(0, 256, size=(36, 128, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        build_sat_pallas(f, interpret=True)


def test_fused_select_rows_interpret_parity(rng):
    """Experimental fused SAT+row-select kernel (interpret mode)."""
    from foveax.kernels.fused_select import sat_select_rows

    h, w, n_out = 64, 256, 20
    frame = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fr = jnp.asarray(np.ascontiguousarray(frame.transpose(0, 2, 1)))
    pyc = np.sort(rng.integers(1, h, n_out)).astype(np.int32)
    pymc = np.minimum(np.sort(rng.integers(0, h - 1, n_out)), pyc - 1).astype(
        np.int32
    )
    hi, lo = sat_select_rows(
        fr, jnp.asarray(pyc), jnp.asarray(pymc), block_rows=8, interpret=True
    )
    sat = np.asarray(build_sat(jnp.asarray(frame)))
    np.testing.assert_array_equal(
        np.asarray(hi)[:, :3].transpose(1, 0, 2), sat[:, pyc, :]
    )
    np.testing.assert_array_equal(
        np.asarray(lo)[:, :3].transpose(1, 0, 2), sat[:, pymc, :]
    )


def test_fused_select_duplicate_and_boundary_rows(rng):
    from foveax.kernels.fused_select import sat_select_rows

    h, w = 32, 128
    frame = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fr = jnp.asarray(np.ascontiguousarray(frame.transpose(0, 2, 1)))
    # Duplicates (fovea), block boundaries, and extremes.
    pyc = np.asarray([1, 7, 8, 8, 8, 9, 16, 31, 31], np.int32)
    pymc = np.asarray([0, 6, 7, 7, 7, 8, 15, 30, 30], np.int32)
    hi, lo = sat_select_rows(
        fr, jnp.asarray(pyc), jnp.asarray(pymc), block_rows=8, interpret=True
    )
    sat = np.asarray(build_sat(jnp.asarray(frame)))
    np.testing.assert_array_equal(
        np.asarray(hi)[:, :3].transpose(1, 0, 2), sat[:, pyc, :]
    )
    np.testing.assert_array_equal(
        np.asarray(lo)[:, :3].transpose(1, 0, 2), sat[:, pymc, :]
    )
