"""Gnomonic viewport projection."""

import jax.numpy as jnp
import numpy as np

from foveax.core.gnomonic import gnomonic_project


def _golden(frame, out_w, out_h, center, scale=(6.0, 3.0)):
    hs, ws, _ = frame.shape
    i = np.arange(out_w)
    j = np.arange(out_h)
    x = (i / out_w - 0.5) * scale[0]
    y = (j / out_h - 0.5) * scale[1]
    x = np.broadcast_to(x[None, :], (out_h, out_w)).astype(np.float64)
    y = np.broadcast_to(y[:, None], (out_h, out_w)).astype(np.float64)
    phi1 = (center[1] - 0.5) * np.pi
    lam0 = (center[0] - 0.5) * 2 * np.pi
    rho = np.sqrt(x * x + y * y)
    c = np.arctan(rho)
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = np.arcsin(
            np.clip(
                np.cos(c) * np.sin(phi1) + y * np.sin(c) * np.cos(phi1) / rho, -1, 1
            )
        )
        lam = lam0 + np.arctan2(
            x * np.sin(c), rho * np.cos(phi1) * np.cos(c) - y * np.sin(phi1) * np.sin(c)
        )
    phi = np.where(rho == 0, phi1, phi)
    lam = np.where(rho == 0, lam0, lam)
    phi = np.mod(phi + np.pi / 2 + 10 * np.pi, 2 * np.pi)
    lam = np.mod(lam + np.pi + 10 * np.pi, 2 * np.pi)
    su = np.clip(lam / (2 * np.pi), 0, 0.999)
    sv = np.clip(phi / np.pi, 0, 0.999)
    sx = (su * ws).astype(np.int64)
    sy = (sv * hs).astype(np.int64)
    return frame[sy, sx]


def test_matches_float64_golden(small_frame):
    out = np.asarray(
        gnomonic_project(
            jnp.asarray(small_frame), 40, 20, jnp.asarray([0.5, 0.5], jnp.float32)
        )
    )
    ref = _golden(small_frame, 40, 20, (0.5, 0.5))
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
