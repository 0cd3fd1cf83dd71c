"""Log-polar foveation baseline (the comparison technique from the paper).

Forward map: output texel (i, j) — i the log-radial index, j the angular
index — samples the source at

    rho(i)   = exp(10 * (i / W_out)^alpha)
    delta    = rho(i) * (cos, sin)(2*pi*j / H_out)

point-sampled (no averaging), with x wraparound modulo the source width and
y clamping (reference: src/image_sampler_sample_logpolar_kernel.cl:5-86).
A 3x3 Gaussian (0.3377 / 0.1217 / 0.0439) is applied to the outer radial
half i >= W_out/2 only (reference kernel :88-142).

The inverse unwarp recovers (i, j) from each output pixel by radius/angle,
snaps when the forward map reproduces the pixel exactly, else blends the
four enclosing (rho, theta) cells bilinearly with angular wraparound
(reference: src/image_sampler_interpolate_kernel.cl:1-81).

The mip-pyramid variant reimplements the reference's *missing* kernel file
(src/image_sampler_sample_mipmap_logpolar_kernel.cl is loaded at
src/image_sampler.cc:125-148 but absent from the repo) from its host-side
calling convention (src/image_sampler.cc:859-990): a flat buffer of 2x
box-downsampled levels with an (offset, w, h) table; each radial ring
samples the level whose texel pitch matches the ring's radial step.

TPU design notes: the (W_out x H_out x 2) delta grid and all transcendental
tables are float64 host precomputes shipped as device constants; per-frame
work is pure vectorized index math + flat gathers, gaze enters as traced
scalars.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * np.pi


def _rho(i: np.ndarray, out_w: int, alpha: float) -> np.ndarray:
    return np.exp(10.0 * (i / float(out_w)) ** alpha)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LogPolarGrid:
    """Precomputed log-polar tables for one (out, source) shape pair."""

    deltas: jax.Array  # (H_out, W_out, 2) int16 — truncated (dx, dy)
    out_width: int = dataclasses.field(metadata=dict(static=True))
    out_height: int = dataclasses.field(metadata=dict(static=True))
    source_width: int = dataclasses.field(metadata=dict(static=True))
    source_height: int = dataclasses.field(metadata=dict(static=True))
    alpha: float = dataclasses.field(metadata=dict(static=True))


@functools.lru_cache(maxsize=16)
def make_logpolar_grid(
    out_width: int,
    out_height: int,
    source_width: int,
    source_height: int,
    alpha: float = 1.0,
) -> LogPolarGrid:
    i = np.arange(out_width, dtype=np.float64)
    j = np.arange(out_height, dtype=np.float64)
    rho = _rho(i, out_width, alpha)  # (W,)
    ang = j / float(out_height) * _TWO_PI  # (H,)
    dx = np.trunc(rho[None, :] * np.cos(ang)[:, None]).astype(np.int16)
    dy = np.trunc(rho[None, :] * np.sin(ang)[:, None]).astype(np.int16)
    return LogPolarGrid(
        deltas=jnp.asarray(np.stack([dx, dy], axis=-1)),
        out_width=out_width,
        out_height=out_height,
        source_width=source_width,
        source_height=source_height,
        alpha=alpha,
    )


def sample_logpolar(
    frame: jax.Array, grid: LogPolarGrid, center: jax.Array
) -> jax.Array:
    """(Hs, Ws, 3) uint8 -> (H_out, W_out, 3) uint8 log-polar point sample.

    Position math mirrors the reference kernel: float add then truncation,
    x modulo wrap, y clamp (src/image_sampler_sample_logpolar_kernel.cl:67-74).
    """
    hs, ws, _ = frame.shape
    d = grid.deltas.astype(jnp.float32)
    x = (center[0] * jnp.float32(ws) + d[..., 0]).astype(jnp.int32)
    y = (center[1] * jnp.float32(hs) + d[..., 1]).astype(jnp.int32)
    x = jnp.remainder(x + 10 * ws, ws)
    y = jnp.clip(y, 0, hs - 1)
    flat = frame.reshape(-1, 3)
    return jnp.take(flat, y * ws + x, axis=0)


def logpolar_gaussian_blur(img: jax.Array) -> jax.Array:
    """3x3 Gaussian on the outer radial half (columns i >= W/2) only.

    Weights 0.3377 center / 0.1217 edge / 0.0439 corner, clamped borders
    (reference: src/image_sampler_sample_logpolar_kernel.cl:110-137).
    """
    h, w, _ = img.shape
    f = img.astype(jnp.float32)
    p = jnp.pad(f, ((1, 1), (1, 1), (0, 0)), mode="edge")
    c = p[1:-1, 1:-1]
    edges = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
    corners = p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2] + p[2:, 2:]
    blurred = 0.3377 * c + 0.1217 * edges + 0.0439 * corners
    cols = jnp.arange(w) >= w // 2
    return jnp.where(cols[None, :, None], blurred, f).astype(jnp.uint8)


def unwarp_logpolar(
    reduced: jax.Array,
    out_width: int,
    out_height: int,
    center: jax.Array,
    alpha: float = 1.0,
) -> jax.Array:
    """Inverse log-polar: (Hr, Wr, 3) uint8 -> (out_h, out_w, 3) uint8.

    Mirrors src/image_sampler_interpolate_kernel.cl: radius/angle inversion,
    snap-exact check against a host-precomputed forward table, else bilinear
    in (rho, theta) with angular wrap.
    """
    hr, wr, _ = reduced.shape

    # Host tables: forward deltas rho(i)*(cos, sin)(2 pi j / Hr) in float32.
    i_h = np.arange(wr, dtype=np.float64)
    j_h = np.arange(hr, dtype=np.float64)
    rho_t = _rho(i_h, wr, alpha)
    ang_t = j_h / float(hr) * _TWO_PI
    fwd_dx = jnp.asarray((rho_t[None, :] * np.cos(ang_t)[:, None]).astype(np.float32))
    fwd_dy = jnp.asarray((rho_t[None, :] * np.sin(ang_t)[:, None]).astype(np.float32))

    cxp = (center[0] * jnp.float32(out_width)).astype(jnp.int32)
    cyp = (center[1] * jnp.float32(out_height)).astype(jnp.int32)

    xs = jnp.arange(out_width, dtype=jnp.int32)[None, :]
    ys = jnp.arange(out_height, dtype=jnp.int32)[:, None]
    half = out_width // 2
    x = jnp.where(
        xs - cxp > half, xs - out_width, jnp.where(xs - cxp < -half, xs + out_width, xs)
    )
    dx = (x - cxp).astype(jnp.float32)
    dy = (ys - cyp).astype(jnp.float32) * jnp.ones_like(dx)

    r2 = dx * dx + dy * dy
    at_center = (dx == 0) & (dy == 0)
    i_f = jnp.where(
        at_center,
        0.0,
        jnp.float32(wr) * (jnp.log(jnp.sqrt(r2)) / 10.0) ** np.float32(1.0 / alpha),
    )
    i_idx = jnp.clip(jnp.floor(i_f + 0.5).astype(jnp.int32), 0, wr - 1)

    # Angle: atan with the pi*(dx<0) branch correction, wrapped to [0, Hr)
    # (reference kernel :36-43).
    j_gen = (jnp.arctan(dy / jnp.where(dx == 0, 1.0, dx)) + np.pi * (dx < 0)) * (
        jnp.float32(hr) / np.float32(_TWO_PI)
    )
    j_gen = jnp.mod(j_gen + 2 * hr, hr)
    j_dx0 = (np.pi / 2 + np.pi * (dy < 0)) * (jnp.float32(hr) / np.float32(_TWO_PI))
    j_f = jnp.where(dx == 0, j_dx0, j_gen)
    j_idx = jnp.clip(jnp.floor(j_f + 0.5).astype(jnp.int32), 0, hr - 1)

    # Snap check: forward-map (i_idx, j_idx) and compare to the pixel.
    flat_fwd = j_idx * wr + i_idx
    calc_x = (
        center[0] * jnp.float32(out_width) + jnp.take(fwd_dx.reshape(-1), flat_fwd)
    ).astype(jnp.int32)
    calc_y = (
        center[1] * jnp.float32(out_height) + jnp.take(fwd_dy.reshape(-1), flat_fwd)
    ).astype(jnp.int32)
    exact = (calc_x == x) & (calc_y == ys)

    src = reduced.astype(jnp.float32)
    flat = src.reshape(-1, 3)

    min_i = jnp.clip(jnp.floor(i_f).astype(jnp.int32), 0, wr - 1)
    max_i = jnp.clip(jnp.ceil(i_f).astype(jnp.int32), 0, wr - 1)
    min_j = jnp.mod(jnp.floor(j_f).astype(jnp.int32) + hr, hr)
    max_j = jnp.mod(jnp.ceil(j_f).astype(jnp.int32) + hr, hr)

    tl = jnp.take(flat, min_j * wr + min_i, axis=0)
    tr = jnp.take(flat, min_j * wr + max_i, axis=0)
    bl = jnp.take(flat, max_j * wr + min_i, axis=0)
    br = jnp.take(flat, max_j * wr + max_i, axis=0)

    ir = (i_f - jnp.floor(i_f))[..., None]
    jr = (j_f - jnp.floor(j_f))[..., None]
    left = tl + (bl - tl) * jr
    right = tr + (br - tr) * jr
    blended = left + (right - left) * ir

    ev = jnp.take(flat, j_idx * wr + i_idx, axis=0)
    out = jnp.where(exact[..., None], ev, blended)
    return out.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Image pyramid variant


@functools.lru_cache(maxsize=16)
def pyramid_layout(width: int, height: int, levels: int):
    """(offsets, widths, heights) following the reference host loop
    (src/image_sampler.cc:881-919): offset accumulates the *previous*
    level's pixel count; dims halve by integer division."""
    offs, ws, hs = [0], [width], [height]
    off, w, h = 0, width, height
    for _ in range(1, levels):
        off += w * h
        w //= 2
        h //= 2
        offs.append(off)
        ws.append(w)
        hs.append(h)
    return tuple(offs), tuple(ws), tuple(hs)


def build_pyramid(frame: jax.Array, levels: int) -> jax.Array:
    """(H, W, 3) uint8 -> flat (N, 3) uint8 buffer of `levels` mip levels.

    Level k+1 is the 2x2 box mean (truncated) of level k.  The reference's
    downsample kernel is the missing file; box-mean is the standard choice
    its host conventions imply.
    """
    h, w, _ = frame.shape
    offs, ws, hs = pyramid_layout(w, h, levels)
    flat_parts = [frame.reshape(-1, 3)]
    cur = frame
    for k in range(1, levels):
        hw, ww = hs[k], ws[k]
        c = cur[: 2 * hw, : 2 * ww].astype(jnp.uint32)
        down = (
            (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]) // 4
        ).astype(jnp.uint8)
        flat_parts.append(down.reshape(-1, 3))
        cur = down
    return jnp.concatenate(flat_parts, axis=0)


def sample_logpolar_pyramid(
    pyramid_flat: jax.Array,
    grid: LogPolarGrid,
    center: jax.Array,
    levels: int,
) -> jax.Array:
    """Log-polar sample with per-ring mip selection.

    Ring i samples level  clamp(floor(log2(max(rho(i+1)-rho(i), 1))), 0, L-1)
    — the level whose texel pitch matches the ring's radial step, which is
    the anti-aliasing rationale of the mip variant.
    """
    wo, ho = grid.out_width, grid.out_height
    ws, hs = grid.source_width, grid.source_height
    offs, lws, lhs = pyramid_layout(ws, hs, levels)

    # Host tables per radial index i.
    i_h = np.arange(wo + 1, dtype=np.float64)
    rho = _rho(i_h, wo, grid.alpha)
    step = np.maximum(rho[1:] - rho[:-1], 1.0)
    lvl = np.clip(np.floor(np.log2(step)).astype(np.int64), 0, levels - 1)
    lvl_off = jnp.asarray(np.asarray(offs)[lvl])  # (Wo,)
    lvl_w = jnp.asarray(np.asarray(lws)[lvl])
    lvl_h = jnp.asarray(np.asarray(lhs)[lvl])
    lvl_shift = jnp.asarray(lvl)

    d = grid.deltas.astype(jnp.float32)
    x = (center[0] * jnp.float32(ws) + d[..., 0]).astype(jnp.int32)
    y = (center[1] * jnp.float32(hs) + d[..., 1]).astype(jnp.int32)
    x = jnp.remainder(x + 10 * ws, ws)
    y = jnp.clip(y, 0, hs - 1)

    sh = lvl_shift[None, :]
    lx = jnp.minimum(x >> sh, lvl_w[None, :] - 1)
    ly = jnp.minimum(y >> sh, lvl_h[None, :] - 1)
    idx = lvl_off[None, :] + ly * lvl_w[None, :] + lx
    return jnp.take(pyramid_flat, idx, axis=0)
