"""Inverse gnomonic (rectilinear-viewport) projection from equirectangular.

For each viewport pixel, project through the tangent plane at the gaze
center onto the sphere and fetch the nearest equirect texel (reference:
src/projections_program.cl:1-47, host src/projections.cc:51-86).  The
reference's viewport FOV scale is (6, 3) (src/projections_program.cl:20).

The reference divides by rho without guarding the viewport center
(rho == 0 -> NaN); foveax defines the center pixel to map to the gaze
point, which is the analytic limit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gnomonic_project(
    frame: jax.Array,
    out_width: int,
    out_height: int,
    center: jax.Array,
    scale: tuple[float, float] = (6.0, 3.0),
) -> jax.Array:
    """(Hs, Ws, 3) uint8 equirect -> (out_h, out_w, 3) uint8 viewport."""
    hs, ws, _ = frame.shape

    u = (jnp.arange(out_width, dtype=jnp.float32) / out_width - 0.5) * scale[0]
    v = (jnp.arange(out_height, dtype=jnp.float32) / out_height - 0.5) * scale[1]
    x = u[None, :] * jnp.ones((out_height, 1), jnp.float32)
    y = v[:, None] * jnp.ones((1, out_width), jnp.float32)

    phi1 = (center[1] - 0.5) * np.float32(np.pi)
    lam0 = (center[0] - 0.5) * np.float32(2.0 * np.pi)

    rho = jnp.sqrt(x * x + y * y)
    safe_rho = jnp.where(rho == 0, 1.0, rho)
    c = jnp.arctan(rho)
    cos_c, sin_c = jnp.cos(c), jnp.sin(c)
    phi = jnp.arcsin(
        jnp.clip(
            cos_c * jnp.sin(phi1) + (y * sin_c * jnp.cos(phi1)) / safe_rho,
            -1.0,
            1.0,
        )
    )
    lam = lam0 + jnp.arctan2(
        x * sin_c, rho * jnp.cos(phi1) * cos_c - y * jnp.sin(phi1) * sin_c
    )
    # Center pixel: analytic limit (the reference NaNs here).
    phi = jnp.where(rho == 0, phi1, phi)
    lam = jnp.where(rho == 0, lam0, lam)

    two_pi = np.float32(2.0 * np.pi)
    phi = jnp.mod(phi + np.float32(np.pi / 2) + 10 * np.float32(np.pi), two_pi)
    lam = jnp.mod(lam + np.float32(np.pi) + 10 * np.float32(np.pi), two_pi)

    su = jnp.clip(lam / two_pi, 0.0, 0.999)
    sv = jnp.clip(phi / np.float32(np.pi), 0.0, 0.999)

    sx = (su * ws).astype(jnp.int32)
    sy = (sv * hs).astype(jnp.int32)
    # Row-gather from the (N, 3) view: for truly scattered 2-D indices the
    # per-row fetch beats three separate channel-plane gathers (measured
    # 9.1 vs 10.2 ms at 4K->1080p) — unlike the separable per-axis gathers
    # elsewhere, where planar wins.
    flat = frame.reshape(-1, 3)
    return jnp.take(flat, sy * ws + sx, axis=0)
