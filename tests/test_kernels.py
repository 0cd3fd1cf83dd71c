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
