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


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    xs = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def _filter2_valid(img: jax.Array, win: jax.Array) -> jax.Array:
    """Separable 2-D Gaussian filter, VALID padding, channels vectorized.

    ``img``: (H, W, C) float32.  Two tensordot-free 1-D convolutions via
    conv_general_dilated keep this one fused XLA region (no gathers; on
    TPU the small convs lower to MXU-friendly contractions).
    """
    k = win.shape[0]
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    ky = win.reshape(1, 1, k, 1)
    kx = win.reshape(1, 1, 1, k)
    # Precision.HIGHEST: on TPU these contractions hit the MXU, which
    # truncates f32 operands to bf16 by default — a*a reaches 65025
    # (abs error up to ~128 in bf16) and the E[x^2]-mu^2 variance
    # cancellation in ssim_map would then be wrong by its own magnitude
    # in smooth regions (same hazard the SVD einsums hit, round 3).
    hi = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID", precision=hi)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID", precision=hi)
    return x[:, 0].transpose(1, 2, 0)  # (H-k+1, W-k+1, C)


def ssim_map(
    a: jax.Array,
    b: jax.Array,
    peak: float = 255.0,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Per-pixel SSIM index map (Wang et al., IEEE TIP 2004).

    Standard constants K1=0.01, K2=0.03, 11x11 Gaussian window with
    sigma 1.5 — scikit-image's ``gaussian_weights=True`` window, with
    the population (``use_sample_covariance=False``) variance form:
    cross-validating against skimage needs that flag, since its default
    applies an N/(N-1) sample correction this (and the float64 golden)
    deliberately omit.  Returns the (H-10, W-10, C) VALID-region map so
    weighted variants (foveal/eccentricity) can re-weight it spatially.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = _gaussian_window(win_size, sigma)
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    mu_a = _filter2_valid(a, win)
    mu_b = _filter2_valid(b, win)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _filter2_valid(a * a, win) - mu_aa
    var_b = _filter2_valid(b * b, win) - mu_bb
    cov = _filter2_valid(a * b, win) - mu_ab
    return ((2.0 * mu_ab + c1) * (2.0 * cov + c2)) / (
        (mu_aa + mu_bb + c1) * (var_a + var_b + c2)
    )


def ssim(a: jax.Array, b: jax.Array, peak: float = 255.0) -> jax.Array:
    """Mean structural similarity over the frame (1.0 = identical).

    Complements PSNR in the quality/ladder tables: PSNR flatters blur
    (low-frequency error spreads thin), SSIM's local contrast/structure
    terms do not — so the foveal-advantage readings stay meaningful for
    box-filtered peripheries.
    """
    return jnp.mean(ssim_map(a, b, peak))


def _valid_center_weights(shape, center, radius_frac, kind):
    """Gaze weight map on the SSIM map's VALID region (offset k//2)."""
    h, w = shape[0] + 10, shape[1] + 10  # original frame dims (k=11)
    ys = jnp.arange(shape[0], dtype=jnp.float32)[:, None] + 5.0
    xs = jnp.arange(shape[1], dtype=jnp.float32)[None, :] + 5.0
    cx = center[0] * w
    cy = center[1] * h
    dx = jnp.abs(xs - cx)
    dx = jnp.minimum(dx, w - dx)  # 360 wrap
    dy = ys - cy
    r = radius_frac * h
    if kind == "disc":
        return ((dx * dx + dy * dy) <= r * r).astype(jnp.float32)
    return jnp.exp(-(dx * dx + dy * dy) / (2.0 * r * r))


def foveal_ssim(
    a: jax.Array, b: jax.Array, center: jax.Array, radius_frac: float = 0.1
) -> jax.Array:
    """Mean SSIM restricted to a disc of ``radius_frac * height`` around
    the gaze (x wraps across the 360 seam) — the SSIM twin of
    :func:`foveal_psnr`."""
    m = ssim_map(a, b)
    wgt = _valid_center_weights(m.shape, center, radius_frac, "disc")
    return jnp.sum(m * wgt[..., None]) / jnp.maximum(
        jnp.sum(wgt) * a.shape[-1], 1.0
    )


def eccentricity_weighted_ssim(
    a: jax.Array, b: jax.Array, center: jax.Array, sigma_frac: float = 0.25
) -> jax.Array:
    """SSIM with the same Gaussian acuity falloff as
    :func:`eccentricity_weighted_psnr`."""
    m = ssim_map(a, b)
    wgt = _valid_center_weights(m.shape, center, sigma_frac, "gauss")
    return jnp.sum(m * wgt[..., None]) / jnp.maximum(
        jnp.sum(wgt) * a.shape[-1], 1e-6
    )


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
