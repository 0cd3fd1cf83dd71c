"""Quality metrics for foveation evaluation.

The reference paper evaluates techniques by PSNR/quality vs the original
frame (results live in the paper, not the repo — SURVEY.md §6).  foveax
ships the measurement tools: full-frame PSNR, foveal-region PSNR (quality
where the user is actually looking), and eccentricity-weighted PSNR (a
simple acuity falloff weighting).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def psnr(a: jax.Array, b: jax.Array, peak: float = 255.0) -> jax.Array:
    m = mse(a, b)
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(m, 1e-10))


def foveal_psnr(
    a: jax.Array, b: jax.Array, center: jax.Array, radius_frac: float = 0.1
) -> jax.Array:
    """PSNR restricted to a disc of ``radius_frac * height`` around the
    gaze (x distance wraps across the 360 seam)."""
    h, w = a.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = center[0] * w
    cy = center[1] * h
    dx = jnp.abs(xs - cx)
    dx = jnp.minimum(dx, w - dx)  # 360 wrap
    dy = ys - cy
    r = radius_frac * h
    mask = (dx * dx + dy * dy) <= r * r
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    m = jnp.sum(d * d * mask[..., None]) / jnp.maximum(
        jnp.sum(mask) * a.shape[-1], 1
    )
    return 10.0 * jnp.log10(255.0 * 255.0 / jnp.maximum(m, 1e-10))


def ws_psnr(a: jax.Array, b: jax.Array, peak: float = 255.0) -> jax.Array:
    """WS-PSNR: sphere-weighted PSNR for equirectangular frames.

    Equirect pixels near the poles cover far less solid angle than their
    area suggests, so planar PSNR over-weights polar error.  WS-PSNR
    (Sun, Lu, Yu — IEEE SPL 2017; adopted by JVET for 360 video) weights
    each row by cos(latitude) evaluated at the pixel center:
    w(y) = cos((y + 0.5 - H/2) * pi / H).  Uniform error ⇒ identical to
    planar PSNR (weights normalize out); pole-concentrated error is
    down-weighted toward its true solid-angle share.
    """
    h = a.shape[0]
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 - h / 2.0) * (jnp.pi / h)
    wgt = jnp.cos(ys)[:, None, None]  # (H, 1, 1) broadcasts over W, C
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    m = jnp.sum(d * d * wgt) / (jnp.sum(wgt) * a.shape[1] * a.shape[2])
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(m, 1e-10))


def eccentricity_weighted_psnr(
    a: jax.Array, b: jax.Array, center: jax.Array, sigma_frac: float = 0.25
) -> jax.Array:
    """PSNR with a Gaussian acuity falloff around the gaze — errors in the
    periphery matter less, mirroring what foveated rendering exploits."""
    h, w = a.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = center[0] * w
    cy = center[1] * h
    dx = jnp.abs(xs - cx)
    dx = jnp.minimum(dx, w - dx)
    dy = ys - cy
    sig = sigma_frac * h
    wgt = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sig * sig))
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    m = jnp.sum(d * d * wgt[..., None]) / jnp.maximum(
        jnp.sum(wgt) * a.shape[-1], 1e-6
    )
    return 10.0 * jnp.log10(255.0 * 255.0 / jnp.maximum(m, 1e-10))
