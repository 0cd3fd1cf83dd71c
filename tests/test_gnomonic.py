"""Gnomonic viewport projection."""

import jax.numpy as jnp
import numpy as np

from foveax.core import golden
from foveax.core.gnomonic import gnomonic_project


def test_matches_float64_golden(small_frame):
    out = np.asarray(
        gnomonic_project(
            jnp.asarray(small_frame), 40, 20, jnp.asarray([0.5, 0.5], jnp.float32)
        )
    )
    ref = golden.gnomonic_project(small_frame, 40, 20, (0.5, 0.5))
    # float32 vs float64 trig can shift a source texel by one at cell
    # boundaries; require overwhelming agreement.
    same = (out == ref).all(axis=-1).mean()
    assert same > 0.97, f"agreement {same}"


def test_center_pixel_is_gaze_point(small_frame):
    hs, ws, _ = small_frame.shape
    center = (0.37, 0.61)
    # Even dims so pixel (out_w/2, out_h/2) sits exactly at rho = 0.
    out = np.asarray(
        gnomonic_project(
            jnp.asarray(small_frame), 40, 20, jnp.asarray(center, jnp.float32)
        )
    )
    # Viewport center (rho=0) looks at the gaze point on the sphere.
    gx = int(np.clip((center[0]) % 1.0, 0, 0.999) * ws)
    gy = int(np.clip((center[1]) % 1.0, 0, 0.999) * hs)
    # the exact formula: lam=lam0 -> u = center.x; phi=phi1 -> v = center.y
    np.testing.assert_array_equal(out[10, 20], small_frame[gy, gx])


def test_no_nans_anywhere(small_frame):
    out = np.asarray(
        gnomonic_project(
            jnp.asarray(small_frame), 33, 17, jnp.asarray([0.0, 1.0], jnp.float32)
        )
    )
    assert out.shape == (17, 33, 3)
