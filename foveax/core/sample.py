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

Shared-tap gathers (``taps="shared"``, the default): the tap vectors are
shifted copies of each other — ``pxm[i] = px[i-1]`` and ``pym[j] =
py[j-1]`` both read the same position vector ``p[k] = c + grid[k]`` — so
one (N+1)-wide gather serves both the hi and lo taps of every element,
halving gather traffic (the dominant cost: the TPU gather engine runs
~13x below streaming bandwidth).  The shared positions disagree with the
reference's elementwise wrap+clamp rules only where an element's two taps
would clamp/wrap differently: measured over ALL integer gaze positions at
1080p/4K/8K, at most TWO elements per axis mismatch (the p==0 / p==dim-1
edge strips and the 360-wrap seam).  Those elements are repaired exactly
with a bounded-size (``_FIX_K``) top_k fixup: gather the true taps for
the mismatched rows/columns and scatter them over the shared result —
bit-identical output, ~2x less gather traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from foveax.core.logrect import LogRectGrid, _grid_axis


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


# Fixup capacity for the shared-tap path.  Measured worst case is 2
# mismatched elements per axis over all integer gaze positions at every
# supported resolution (see tests/test_sample.py); 8 is 4x headroom.
_FIX_K = 8


def longest_run(mask) -> tuple[int, int]:
    """[start, end) of the longest contiguous True run in a bool array.

    Shared by the u16-band finder below and the direct sampler's band
    split (foveax/core/direct.py) — the trailing-run handling is easy to
    get wrong twice."""
    best = (0, 0)
    start = None
    n = len(mask)
    for j in range(n + 1):
        if j < n and mask[j]:
            if start is None:
                start = j
        else:
            if start is not None and j - start > best[1] - best[0]:
                best = (start, j)
            start = None
    return best


@functools.lru_cache(maxsize=64)
def _u16_row_bands(
    out_width: int, out_height: int, source_width: int, source_height: int
) -> tuple[int, int]:
    """Static output-row band [top, bot) whose column taps fit uint16.

    A box sum is at most 255 * dx_i * dy_j where dx/dy are the STATIC grid
    step vectors (clamped taps only shrink a box, and the wrap/edge fixups
    produce genuine boxes too, so the bound covers every valid element).
    Output row j is "u16-safe" when 255 * dy_j * max(dx) < 2^16: for safe
    rows the horizontal tap difference can be taken mod 2^16, halving the
    bytes through the gather engine.  The big steps live in the exponential
    periphery, so unsafe rows form two edge bands (~5-11% of rows); this
    returns the longest contiguous safe run.  (out_height, out_height)
    means "no safe middle" — callers fall back to all-uint32.
    """
    dx = np.diff(_grid_axis(out_width, source_width).astype(np.int64))
    dy = np.diff(_grid_axis(out_height, source_height).astype(np.int64))
    unsafe = 255 * dy * int(dx.max()) >= 65536
    best = longest_run(~unsafe)
    if best == (0, 0) and (unsafe.all() or out_height == 0):
        return (out_height, out_height)  # no safe middle
    return best


def _axis_taps(g: jax.Array, c: jax.Array, dim: int, *, wrap: bool):
    """Per-axis tap vectors for one axis of the 4-tap box filter.

    Returns (pc, pmc, valid, q, fix): the elementwise-clamped hi/lo tap
    indices (each (N,)), the validity mask, the shared (N+1,) gather
    positions, and the (_FIX_K,) indices of elements whose shared taps
    disagree with (pc, pmc) — padded with -1.
    """
    p = c + g.astype(jnp.int32)  # (N+1,)
    px, pxm = p[1:], p[:-1]

    if wrap:
        # Elementwise 360 wrap: only when BOTH edges fall off the same side
        # (reference: src/sat_decoder_sample_rect_kernel.cl:181-187).
        wrap_hi = (px >= dim) & (pxm >= dim)
        wrap_lo = (px < 0) & (pxm < 0)
        shift = jnp.where(wrap_hi, -dim, jnp.where(wrap_lo, dim, 0))
        px = px + shift
        pxm = pxm + shift

    valid = ((px >= 0) & (px < dim)) | ((pxm >= 0) & (pxm < dim))

    # Clamp rule: pos into [1, dim-1], pos_minus into [0, pos-1] (reference:
    # src/sat_decoder_sample_rect_kernel.cl:201-204).  After this, pos > 0
    # always holds, so only the full 4-tap branch of the kernel is live.
    pc = jnp.clip(px, 1, dim - 1)
    pmc = jnp.clip(pxm, 0, pc - 1)

    # Shared positions: per-POSITION wrap (vs the reference's per-element
    # wrap), then the loose clamp.  Grid vectors are strictly increasing,
    # so q[k] serves element k-1's hi tap and element k's lo tap at once
    # except at the edge strips / wrap seam — those land in `fix`.
    if wrap:
        psh = jnp.where(p >= dim, p - dim, jnp.where(p < 0, p + dim, p))
    else:
        psh = p
    q = jnp.clip(psh, 0, dim - 1)

    mism = valid & ((q[1:] != pc) | (q[:-1] != pmc))
    n = pc.shape[0]
    scores = jnp.where(mism, jnp.arange(n, dtype=jnp.int32), jnp.int32(-1))
    fix = jax.lax.top_k(scores, _FIX_K)[0]  # mismatched indices, -1 padded
    return pc, pmc, valid, q, fix


def sample_rect_from_sat(
    sat: jax.Array,
    grid: LogRectGrid,
    center: jax.Array,
    *,
    wrap_x: bool = True,
    out_layout: str = "hwc",
    taps: str = "shared",
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

    ``taps``: "shared" (default) gathers each axis once at the shared
    (N+1,) position vector plus an exact bounded fixup (module docstring);
    "paired" performs the straightforward two-gathers-per-axis version.
    Both are bit-identical to the float64 golden.
    """
    _, hs, ws = sat.shape
    cx = (center[0] * jnp.float32(ws)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(hs)).astype(jnp.int32)

    pxc, pxmc, valid_x, qx, fix_x = _axis_taps(grid.gx, cx, ws, wrap=wrap_x)
    pyc, pymc, valid_y, qy, fix_y = _axis_taps(grid.gy, cy, hs, wrap=False)

    rect = ((pyc - pymc)[:, None] * (pxc - pxmc)[None, :]).astype(jnp.uint32)

    if taps == "shared":
        # One (Ho+1)-row gather; hi/lo rows are adjacent slices of it.  The
        # vertical difference is taken before the column taps: box =
        # (BR-TR) - (BL-TL) = D[px] - D[pxm] with D = rows_hi - rows_lo, so
        # the column stage needs one (Wo+1)-wide gather per band.  Exact
        # under modular arithmetic (subtraction reassociation is wrap-safe;
        # the middle band runs mod 2^16, see _u16_row_bands).  The
        # optimization_barriers stop XLA's slice-of-gather simplification
        # from rewriting G[1:] - G[:-1] back into two full gathers.
        ho, wo = pyc.shape[0], pxc.shape[0]
        grid_dims = (grid.out_width, grid.out_height, ws, hs)
        top, bot = _u16_row_bands(*grid_dims) if ho == grid.out_height else (
            ho,
            ho,
        )

        rows = jax.lax.optimization_barrier(
            jnp.take(sat, qy, axis=1)
        )  # (3, Ho+1, Ws)

        # Correct row taps for the <= _FIX_K mismatched output rows (edge
        # strips): tiny gathers, scattered into each band below.
        safe_j = jnp.maximum(fix_y, 0)
        d_fix = jnp.take(sat, pyc[safe_j], axis=1) - jnp.take(
            sat, pymc[safe_j], axis=1
        )  # (3, K, Ws) u32
        has_fix = fix_y >= 0  # -1-padded entries must not scatter

        def _band(lo: int, hi: int, u16: bool):
            """Vertical diffs for output rows [lo, hi) -> u8 box means."""
            n = hi - lo
            d = rows[:, lo + 1 : hi + 1, :] - rows[:, lo : hi, :]
            fix_here = has_fix & (fix_y >= lo) & (fix_y < hi)
            # Scatter index: -1/out-of-band pads go to n (dropped).  A
            # negative index would WRAP under mode="drop", hence the where.
            jdx = jnp.where(fix_here, fix_y - lo, n)
            if u16:
                d = d.astype(jnp.uint16)
                d = d.at[:, jdx, :].set(d_fix.astype(jnp.uint16), mode="drop")
            else:
                d = d.at[:, jdx, :].set(d_fix, mode="drop")

            cols = jax.lax.optimization_barrier(jnp.take(d, qx, axis=2))
            box = cols[:, :, 1:] - cols[:, :, :-1]  # (3, n, Wo)
            safe_i = jnp.maximum(fix_x, 0)
            box_fix = jnp.take(d, pxc[safe_i], axis=2) - jnp.take(
                d, pxmc[safe_i], axis=2
            )
            idx = jnp.where(fix_x < 0, wo, fix_x)
            box = box.at[:, :, idx].set(box_fix, mode="drop")
            # u16 band boxes are true box sums (< 2^16 by construction).
            return _exact_box_div(
                box.astype(jnp.uint32), rect[None, lo:hi, :]
            ).astype(jnp.uint8)

        pieces = []
        if top > 0:
            pieces.append(_band(0, top, u16=False))
        if bot > top:
            pieces.append(_band(top, bot, u16=True))
        if ho > bot:
            pieces.append(_band(bot, ho, u16=False))
        vals = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
    else:
        rows_hi = jnp.take(sat, pyc, axis=1)  # (3, Ho, Ws)
        rows_lo = jnp.take(sat, pymc, axis=1)
        d = rows_hi - rows_lo
        right = jnp.take(d, pxc, axis=2)  # (3, Ho, Wo)
        left = jnp.take(d, pxmc, axis=2)
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
