"""SAT build + round-trip decode: exact integer semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from foveax.core import golden
from foveax.core.sat import build_sat, decode_sat


def test_sat_matches_golden(small_frame):
    sat = np.asarray(jax.jit(build_sat)(jnp.asarray(small_frame)))
    ref = golden.build_sat(small_frame)
    np.testing.assert_array_equal(sat, ref)


def test_sat_corner_is_total_sum(small_frame):
    sat = np.asarray(build_sat(jnp.asarray(small_frame)))
    totals = small_frame.astype(np.uint64).sum(axis=(0, 1))
    np.testing.assert_array_equal(
        sat[:, -1, -1].astype(np.uint64), totals % (2**32)
    )


def test_sat_roundtrip_exact(small_frame):
    sat = build_sat(jnp.asarray(small_frame))
    back = np.asarray(jax.jit(decode_sat)(sat))
    np.testing.assert_array_equal(back, small_frame)


def test_sat_uint32_wrap_semantics():
    # An all-255 frame big enough that cumsums exceed 2^32 would need 8K;
    # emulate wrap by feeding a synthetic uint32 "image" through the same
    # cumsum path via repeated decode/build: differences of a wrapped SAT
    # still reconstruct the image exactly (mod 2^32 telescoping).
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    sat = np.asarray(build_sat(jnp.asarray(frame)))
    # Offset the whole SAT by a huge constant: differences are unchanged.
    shifted = (sat + np.uint32(0xFEDCBA98)).astype(np.uint32)
    with np.errstate(over="ignore"):
        img = (
            shifted[:, 1:, 1:]
            - shifted[:, :-1, 1:]
            - shifted[:, 1:, :-1]
            + shifted[:, :-1, :-1]
        )
    np.testing.assert_array_equal(
        img.transpose(1, 2, 0), frame[1:, 1:, :]
    )
