"""Gaze-centered log-rectilinear downsampling via 4-tap SAT box filter.

This is the server-side hot op (reference:
src/sat_decoder_sample_rect_kernel.cl:138-241 ``sample_rect_kernel`` and
:298-382 ``sample_rect_360_kernel``; host wrappers
src/sat_decoder.cc:301-398).

TPU-native design: because the grid is separable (see foveax.core.logrect),
all tap coordinates are 1-D vectors — ``px(i)``/``pxm(i)`` over output
columns and ``py(j)``/``pym(j)`` over output rows.  The 4 SAT taps then
become two *row* gathers (at ``py`` and ``pym``), a vertical difference,
and two *column* gathers on the difference — per-axis dense gathers
instead of a scattered 2-D gather.  The gaze center enters as two traced
scalars added to the constant grid, so a moving gaze never recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from foveax.core.logrect import LogRectGrid


def _exact_box_div(box: jax.Array, rect: jax.Array) -> jax.Array:
    """Exact unsigned box/rect division via float32 + one-step fixup.

    Native uint32 division is ~15x slower than float math on the VPU.  For
    genuine box sums, box <= 255*rect, so float32 rounding of box keeps the
    quotient estimate within (q-1, q+1]: round-trip the remainder in uint32
    (a wrapped "negative" shows up as >= 2^31) and correct by at most one.
    rect < 2^24 is exact in float32 (max box area is the frame size).
    Garbage quotients on invalid (masked-out) texels are harmless.
    """
    q0 = (box.astype(jnp.float32) / rect.astype(jnp.float32)).astype(jnp.uint32)
    rem = box - q0 * rect  # wraps past 2^31 when q0 overshot
    wrapped = rem >= jnp.uint32(0x80000000)
    over = (~wrapped) & (rem >= rect)
    return q0 + over.astype(jnp.uint32) - wrapped.astype(jnp.uint32)


def _axis_positions(g: jax.Array, center_scaled: jax.Array):
    """pos / pos_minus vectors for one axis from the (dim+1,) grid vector."""
    gi = g.astype(jnp.int32)
    pos = center_scaled + gi[1:]
    pos_minus = center_scaled + gi[:-1]
    return pos, pos_minus


def sample_rect_from_sat(
    sat: jax.Array,
    grid: LogRectGrid,
    center: jax.Array,
    *,
    wrap_x: bool = True,
    out_layout: str = "hwc",
) -> jax.Array:
    """Foveate: (3, Hs, Ws) uint32 SAT -> reduced uint8 frame.

    ``center`` is a float32 (2,) array (cx, cy) in [0, 1].  ``wrap_x``
    enables the 360-degree horizontal wraparound applied when both rectangle
    edges fall off the same side (reference:
    src/sat_decoder_sample_rect_kernel.cl:181-187).  Invalid texels (box
    fully outside the frame vertically) are written as 0 — the reference
    leaves stale buffer contents there instead (src/.../:197-200), which is
    not reproducible in a functional setting.

    ``out_layout``: "hwc" returns (Ho, Wo, 3); "chw" returns the internal
    channel-planar (3, Ho, Wo) — the TPU-preferred layout (the size-3
    channel axis on lanes wastes 125/128 of the vector width, and the
    planar form skips a minor-dim transpose worth ~1.4 ms at 4K).
    """
    _, hs, ws = sat.shape
    cx = (center[0] * jnp.float32(ws)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(hs)).astype(jnp.int32)

    px, pxm = _axis_positions(grid.gx, cx)  # (Wo,)
    py, pym = _axis_positions(grid.gy, cy)  # (Ho,)

    if wrap_x:
        wrap_hi = (px >= ws) & (pxm >= ws)
        wrap_lo = (px < 0) & (pxm < 0)
        shift = jnp.where(wrap_hi, -ws, jnp.where(wrap_lo, ws, 0))
        px = px + shift
        pxm = pxm + shift

    valid_x = ((px >= 0) & (px < ws)) | ((pxm >= 0) & (pxm < ws))
    valid_y = ((py >= 0) & (py < hs)) | ((pym >= 0) & (pym < hs))

    # Clamp rule: pos into [1, dim-1], pos_minus into [0, pos-1] (reference:
    # src/sat_decoder_sample_rect_kernel.cl:201-204).  After this, pos > 0
    # always holds, so only the full 4-tap branch of the kernel is live.
    pxc = jnp.clip(px, 1, ws - 1)
    pyc = jnp.clip(py, 1, hs - 1)
    pxmc = jnp.clip(pxm, 0, pxc - 1)
    pymc = jnp.clip(pym, 0, pyc - 1)

    # Two row gathers, then the VERTICAL difference is taken before the
    # column taps: box = (BR-TR) - (BL-TL) = D[px] - D[pxm] with
    # D = rows_hi - rows_lo, so only two column gathers are needed
    # instead of four.  Exact under mod-2^32 arithmetic (subtraction
    # reassociation is wrap-safe).
    rows_hi = jnp.take(sat, pyc, axis=1)  # (3, Ho, Ws)
    rows_lo = jnp.take(sat, pymc, axis=1)
    d = rows_hi - rows_lo
    right = jnp.take(d, pxc, axis=2)  # (3, Ho, Wo)
    left = jnp.take(d, pxmc, axis=2)

    rect = ((pyc - pymc)[:, None] * (pxc - pxmc)[None, :]).astype(jnp.uint32)
    box = right - left  # uint32, mod-2^32 wrap is intentional
    vals = _exact_box_div(box, rect[None]).astype(jnp.uint8)

    valid = (valid_y[:, None] & valid_x[None, :])[None]
    out = jnp.where(valid, vals, jnp.uint8(0))
    if out_layout == "chw":
        return out
    return out.transpose(1, 2, 0)


def sample_rect_360_from_sat(
    sat: jax.Array,
    grid: LogRectGrid,
    center: jax.Array,
    *,
    out_layout: str = "hwc",
) -> jax.Array:
    """Faithful port of the reference's *second* sampling kernel,
    ``sample_rect_360_kernel`` (reference:
    src/sat_decoder_sample_rect_kernel.cl:298-382).

    Its grid indexing is genuinely distinct from ``sample_rect_kernel``:
    deltas are read as flat short2 pairs at ``(j+2)*gw + (i+2)`` and
    ``(j+2)*gw + (i-1)``, so (a) the x-box spans 3 grid cells, (b) both
    edges take their y-delta from grid row j+2 (making the y-box one
    source row tall after the clamp), and (c) at the first/last output
    column the flat index rolls into the adjacent grid row.  The reference
    reads out of the grid buffer entirely for the rows where
    ``(j+2)*gw + (i+2) >= gh*gw``; those texels are zeroed here (the
    returned image is only defined where the golden's ``defined`` mask
    holds — see foveax.core.golden.sample_rect_360).

    Not a hot path (no reference driver calls its host wrapper either,
    src/sat_decoder.cc:350-398); implemented with dense 2-D index maps
    rather than the separable fast path of ``sample_rect_from_sat``.
    """
    import numpy as np

    _, hs, ws = sat.shape
    wo, ho = grid.out_width, grid.out_height
    gw, gh = wo + 1, ho + 1
    cx = (center[0] * jnp.float32(ws)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(hs)).astype(jnp.int32)

    # Flat pair index maps are compile-time constants (NumPy); the grid
    # vectors stay traced (separable: flat pair cell k holds
    # (gx[k % gw], gy[k // gw])), the gaze stays traced.
    jj, ii = np.mgrid[0:ho, 0:wo]
    flat_hi = (jj + 2) * gw + (ii + 2)
    flat_lo = (jj + 2) * gw + (ii - 1)
    defined = flat_hi < gh * gw
    fh = np.clip(flat_hi, 0, gh * gw - 1)
    fl = np.clip(flat_lo, 0, gh * gw - 1)

    gx = grid.gx.astype(jnp.int32)
    gy = grid.gy.astype(jnp.int32)
    px = cx + gx[jnp.asarray(fh % gw)]
    py = cy + gy[jnp.asarray(fh // gw)]
    pxm = cx + gx[jnp.asarray(fl % gw)]
    pym = cy + gy[jnp.asarray(fl // gw)]

    # Shared tail of both kernels: wrap, validity, clamp, 4-tap box.
    wrap_hi = (px >= ws) & (pxm >= ws)
    wrap_lo = (px < 0) & (pxm < 0)
    shift = jnp.where(wrap_hi, -ws, jnp.where(wrap_lo, ws, 0))
    px = px + shift
    pxm = pxm + shift

    valid = (((px >= 0) & (px < ws)) | ((pxm >= 0) & (pxm < ws))) & (
        ((py >= 0) & (py < hs)) | ((pym >= 0) & (pym < hs))
    )
    pxc = jnp.clip(px, 1, ws - 1)
    pyc = jnp.clip(py, 1, hs - 1)
    pxmc = jnp.clip(pxm, 0, pxc - 1)
    pymc = jnp.clip(pym, 0, pyc - 1)

    br = sat[:, pyc, pxc]
    tr = sat[:, pymc, pxc]
    tl = sat[:, pymc, pxmc]
    bl = sat[:, pyc, pxmc]
    rect = ((pyc - pymc) * (pxc - pxmc)).astype(jnp.uint32)
    vals = _exact_box_div(br - tr + tl - bl, rect[None]).astype(jnp.uint8)

    keep = (valid & jnp.asarray(defined))[None]
    out = jnp.where(keep, vals, jnp.uint8(0))
    if out_layout == "chw":
        return out
    return out.transpose(1, 2, 0)


def expand_sampled_rect(
    reduced: jax.Array,
    out_width: int,
    out_height: int,
    center: jax.Array,
) -> jax.Array:
    """Forward-scatter expansion: place each reduced texel at its full-res
    anchor position, leaving gaps black — the reference's debugging
    visualization of where samples land (reference:
    src/sat_decoder.cc:555-616 ExpandSampledFrameRectCPU).

    (Hr, Wr, 3) uint8 -> (out_height, out_width, 3) uint8.
    """
    import numpy as np

    from foveax.core.logrect import delta_table

    hr, wr, _ = reduced.shape
    # Raw (non-averaged) deltas with lambda from the OUTPUT dims, exactly
    # as the reference helper computes them.
    lut_x = np.asarray(delta_table(-(wr // 2) - 2, wr // 2 + 2, wr, out_width))
    lut_y = np.asarray(
        delta_table(-(hr // 2) - 2, hr // 2 + 2, hr, out_height)
    )
    u = np.arange(wr) - wr // 2
    v = np.arange(hr) - hr // 2
    dx = jnp.asarray(lut_x[u + wr // 2 + 2])
    dy = jnp.asarray(lut_y[v + hr // 2 + 2])

    cx = (center[0] * jnp.float32(out_width)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(out_height)).astype(jnp.int32)
    x = cx + dx  # (Wr,)
    y = cy + dy  # (Hr,)
    valid = ((x >= 0) & (x < out_width))[None, :] & (
        (y >= 0) & (y < out_height)
    )[:, None]
    flat = y[:, None] * out_width + x[None, :]
    # Invalid sentinel must be a POSITIVE out-of-bounds index: JAX wraps
    # negative indices even under mode="drop" (only idx >= size is
    # dropped), so -1 would scatter onto the last pixel.
    flat = jnp.where(valid, flat, out_height * out_width)

    out = jnp.zeros((out_height * out_width, 3), jnp.uint8)
    out = out.at[flat.reshape(-1)].set(
        reduced.reshape(-1, 3), mode="drop"
    )
    return out.reshape(out_height, out_width, 3)


def sample_rect_point(
    frame: jax.Array,
    grid: LogRectGrid,
    center: jax.Array,
) -> jax.Array:
    """Aliasing baseline: point-sample the RGB frame directly through the
    raw-delta grid — no SAT, no averaging (reference:
    src/image_sampler_sample_rect_kernel.cl:1-46, host
    src/image_sampler.cc:249-299).  Takes a (H, W, 3) uint8 frame and a
    ``make_point_grid`` grid; returns (Ho, Wo, 3) uint8.
    """
    hs, ws, _ = frame.shape
    cx = (center[0] * jnp.float32(ws)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(hs)).astype(jnp.int32)
    x = cx + grid.gx.astype(jnp.int32)  # (Wo,)
    y = cy + grid.gy.astype(jnp.int32)  # (Ho,)

    # Single-sided x wrap (reference kernel :29-33), y bounds check.
    x = jnp.where(x >= ws, x - ws, jnp.where(x < 0, x + ws, x))
    valid = ((x >= 0) & (x < ws))[None, :] & ((y >= 0) & (y < hs))[:, None]
    xc = jnp.clip(x, 0, ws - 1)
    yc = jnp.clip(y, 0, hs - 1)

    rows = jnp.take(frame, yc, axis=0)
    vals = jnp.take(rows, xc, axis=1)
    return jnp.where(valid[..., None], vals, jnp.uint8(0))
