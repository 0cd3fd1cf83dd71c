"""SAT-free gaze-centered log-rectilinear downsampling.

Same op as :func:`foveax.core.sample.sample_rect_from_sat` (reference:
src/sat_decoder_sample_rect_kernel.cl:138-241 ``sample_rect_kernel``) —
bit-identical output for centers in [0, 1]^2 — but computed directly from
the uint8 frame, never materializing the uint32 SAT.  The reference (and
the round-2 foveax hot path) spends most of its frame budget building the
SAT: at 16K that is a 1.6 GB uint32 write whose byte traffic alone puts
30 fps out of reach on one chip (BENCHMARKS.md "16K roofline").  This
module removes it from the single-gaze path.

TPU-native design, exploiting that the averaged log-rect step vectors are
*bimodal*: ~74% of output cells have step 1 (the fovea/near field is an
identity map) and the rest live in two static exponential-periphery runs
with steps <= 23 (every supported resolution; pinned by tests).  Per axis
the output splits into at most three STATIC bands:

- the ``step == 1`` run: source positions are consecutive, so the whole
  band is a contiguous window of the frame — a ``dynamic_slice``, pure
  DMA, zero arithmetic (box = one pixel, rect = 1);
- up to two periphery runs: box sums become one-hot-interval MXU matmuls
  over a gaze-windowed slab, ``box = slab @ W`` with ``W[s, o] = 1 iff
  s`` lies in output cell ``o``'s tap interval.  The weights are built
  from the exact per-element clamped/wrapped tap vectors (the same
  ``_axis_taps`` as the SAT path), so clamp and 360-wrap semantics hold
  elementwise — no fixups in these bands.

Operand exactness on the MXU (which truncates operands to bf16): uint8
pixels (<= 255) and 0/1 weights are bf16-exact; products accumulate in
f32 (exact for integer sums < 2^24; the largest box is 255*23*23 =
134,895).  The corner regions contract twice, so the intermediate
(<= 255*23 = 5,865, not bf16-exact) is split into two exact <=8-bit limb
planes first — the same trick as the scan kernel's chunk-offset matmul.

The crop band's positional map disagrees with the elementwise tap rules
only at frame-edge clamps and the 360 seam (<= ``_FIX_K`` rows/columns
per axis over all integer gazes — swept in tests, same methodology as the
shared-tap sampler); those rows/columns are recomputed exactly from 1-D
prefix sums and scattered over the result.  In the step-1 bands every
box has extent 1 on that axis even under clamping (``pyc = clip(p+1, 1,
dim-1)`` and ``pymc = clip(p, 0, pyc-1)`` collapse to adjacent values),
which the fixup paths rely on.

The x-axis 360 wrap is handled by slicing from a frame padded with
wrap-copied columns (mod-W positions become plain window offsets); the
y axis pads with zeros (out-of-range rows are invalid or clamp-fixed).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from foveax.core.logrect import LogRectGrid
from foveax.core.sample import _FIX_K, _axis_taps, _exact_box_div

# Minimum step==1 run length worth a crop band; shorter runs (tiny test
# frames) fall back to matmul bands, which are exact at any size.
_MIN_CROP = 16


@dataclasses.dataclass(frozen=True)
class _Band:
    kind: str  # "crop" | "mm"
    start: int  # first output cell (inclusive)
    end: int  # last output cell (exclusive)
    win: int  # source-window width (static)


@dataclasses.dataclass(frozen=True)
class _AxisBands:
    bands: tuple[_Band, ...]
    pad_lo: int  # source padding before index 0
    pad_hi: int  # source padding after index dim-1
    crop_g0: int  # grid value at the crop band's first lo tap (0 if none)


@functools.lru_cache(maxsize=64)
def _axis_bands(g_bytes: bytes, dim: int) -> _AxisBands:
    """Static band split for one axis from its grid vector ``g`` (N+1,)."""
    g = np.frombuffer(g_bytes, dtype=np.int64)
    d = np.diff(g)
    n = d.shape[0]

    # Longest contiguous run of step == 1.
    best = (0, 0)
    run = 0
    for i in range(n + 1):
        if i < n and d[i] == 1:
            run += 1
        else:
            if run > best[1] - best[0]:
                best = (i - run, i)
            run = 0
    c0, c1 = best

    bands: list[_Band] = []
    if c1 - c0 >= _MIN_CROP and g[c0] < 0:
        if c0 > 0:
            span = int(g[c0] - g[0])
            bands.append(_Band("mm", 0, c0, min(span + 26, dim)))
        bands.append(_Band("crop", c0, c1, c1 - c0))
        if c1 < n:
            span = int(g[n] - g[c1])
            bands.append(_Band("mm", c1, n, min(span + 26, dim)))
        crop_g0 = int(g[c0])
        pad_lo = max(0, -(crop_g0 + 1))
    else:
        span = int(g[n] - g[0])
        bands.append(_Band("mm", 0, n, min(span + 26, dim)))
        crop_g0 = 0
        pad_lo = 0
    pad_hi = max(b.win for b in bands) + 1
    return _AxisBands(tuple(bands), pad_lo, pad_hi, crop_g0)


def _mm_dt():
    # CPU XLA has no MXU (and slow bf16 dots); f32 is exact for all the
    # integer magnitudes here (module docstring) on both backends.
    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


def _mm_weights(band: _Band, rel_lo, rel_hi, dt):
    """(win, n_out) one-hot interval weights, 0/1 in ``dt``.

    Out-of-window intervals (invalid cells at extreme gazes) simply get
    all-zero columns — their outputs are masked by ``valid`` anyway.
    """
    s = jnp.arange(band.win, dtype=jnp.int32)[:, None]
    lo = rel_lo[band.start : band.end][None, :]
    hi = rel_hi[band.start : band.end][None, :]
    return ((s >= lo) & (s < hi)).astype(dt)


def _limb_split(a):
    """f32 integer array (< 2^16) -> two bf16-exact <=8-bit limb planes."""
    hi = jnp.floor(a * (1.0 / 256.0))
    return hi, a - 256.0 * hi


def sample_rect_direct(
    frame: jax.Array,
    grid: LogRectGrid,
    center: jax.Array,
    *,
    wrap_x: bool = True,
    in_layout: str = "chw",
    out_layout: str = "hwc",
) -> jax.Array:
    """Foveate a uint8 frame directly (no SAT): bit-identical to
    ``sample_rect_from_sat(build_sat(frame), grid, center)`` for centers
    in [0, 1]^2.

    ``frame``: (3, Hs, Ws) uint8 (``in_layout="chw"``, the TPU-native
    planar layout) or (Hs, Ws, 3) (``"hwc"``).  ``center``: traced f32
    (2,).  See module docstring for the algorithm.
    """
    if in_layout == "hwc":
        frame = frame.transpose(2, 0, 1)
    _, hs, ws = frame.shape
    cx = (center[0] * jnp.float32(ws)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(hs)).astype(jnp.int32)

    pxc, pxmc, valid_x, _, _ = _axis_taps(grid.gx, cx, ws, wrap=wrap_x)
    pyc, pymc, valid_y, _, _ = _axis_taps(grid.gy, cy, hs, wrap=False)

    gx = np.asarray(grid.gx, dtype=np.int64)
    gy = np.asarray(grid.gy, dtype=np.int64)
    abx = _axis_bands(gx.tobytes(), ws)
    aby = _axis_bands(gy.tobytes(), hs)
    dt = _mm_dt()

    # Padded frame: y pads are zeros (out-of-range rows are invalid or
    # clamp-fixed); x pads are wrap copies when wrap_x (mod-W positions
    # become plain window offsets), zeros otherwise.
    fp = jnp.pad(frame, ((0, 0), (aby.pad_lo, aby.pad_hi), (0, 0)))
    if wrap_x and (abx.pad_lo or abx.pad_hi):
        left = fp[:, :, ws - abx.pad_lo :] if abx.pad_lo else fp[:, :, :0]
        fp = jnp.concatenate([left, fp, fp[:, :, : abx.pad_hi]], axis=2)
    elif not wrap_x:
        fp = jnp.pad(fp, ((0, 0), (0, 0), (abx.pad_lo, abx.pad_hi)))
    hp = aby.pad_lo + hs + aby.pad_hi
    wp = abx.pad_lo + ws + abx.pad_hi

    def band_base(ab, band, lo_taps, c, g, dim, wrap, total):
        """Traced padded-coordinate window base for one band."""
        p_start = c + jnp.int32(int(g[band.start])) + 1
        if band.kind == "crop":
            base = p_start + ab.pad_lo
            if wrap:
                return jnp.mod(base, dim)  # end fits: win <= pad_lo+pad_hi
            return jnp.clip(base, 0, total - band.win)
        # mm windows anchor on the band's ACTUAL first (clamped) lo tap:
        # a seam-straddle clamp can displace it by up to the max grid step
        # from the raw position (hence the window slack), and anchoring on
        # the raw position would wrap the base away from the clamped tap.
        base = lo_taps[band.start] + 1 + ab.pad_lo
        if wrap:
            return jnp.mod(base, dim)
        return base

    ybase = {
        b: band_base(aby, b, pymc, cy, gy, hs, False, hp) for b in aby.bands
    }
    xbase = {
        b: band_base(abx, b, pxmc, cx, gx, ws, wrap_x, wp) for b in abx.bands
    }

    rect = ((pyc - pymc)[:, None] * (pxc - pxmc)[None, :]).astype(jnp.uint32)

    row_blocks = []
    for yb in aby.bands:
        if yb.kind == "mm":
            rl = pymc + 1 + aby.pad_lo - ybase[yb]
            wy = _mm_weights(yb, rl, rl + (pyc - pymc), dt)  # (win_y, ny)
        col_blocks = []
        for xb in abx.bands:
            slab = jax.lax.dynamic_slice(
                fp, (jnp.int32(0), ybase[yb], xbase[xb]), (3, yb.win, xb.win)
            )
            if xb.kind == "mm":
                if wrap_x:
                    cl = jnp.mod(pxmc + 1 + abx.pad_lo - xbase[xb], ws)
                else:
                    cl = pxmc + 1 + abx.pad_lo - xbase[xb]
                wx = _mm_weights(xb, cl, cl + (pxc - pxmc), dt)  # (win_x, nx)

            if yb.kind == "crop" and xb.kind == "crop":
                col_blocks.append(slab)  # box == pixel, rect == 1
                continue
            if yb.kind == "crop":
                box = jnp.einsum(
                    "chs,sn->chn",
                    slab.astype(dt),
                    wx,
                    preferred_element_type=jnp.float32,
                )
            elif xb.kind == "crop":
                box = jnp.einsum(
                    "csw,sn->cnw",
                    slab.astype(dt),
                    wy,
                    preferred_element_type=jnp.float32,
                )
            else:
                a = jnp.einsum(
                    "csw,sn->cnw",
                    slab.astype(dt),
                    wy,
                    preferred_element_type=jnp.float32,
                )
                hi, lo = _limb_split(a)
                box = 256.0 * jnp.einsum(
                    "cns,st->cnt",
                    hi.astype(dt),
                    wx,
                    preferred_element_type=jnp.float32,
                ) + jnp.einsum(
                    "cns,st->cnt",
                    lo.astype(dt),
                    wx,
                    preferred_element_type=jnp.float32,
                )
            r = rect[yb.start : yb.end, xb.start : xb.end][None]
            col_blocks.append(
                _exact_box_div(box.astype(jnp.uint32), r).astype(jnp.uint8)
            )
        row_blocks.append(
            col_blocks[0]
            if len(col_blocks) == 1
            else jnp.concatenate(col_blocks, axis=2)
        )
    out = (
        row_blocks[0]
        if len(row_blocks) == 1
        else jnp.concatenate(row_blocks, axis=1)
    )

    # Crop-band fixups: rows/columns where the positional map disagrees
    # with the elementwise clamp/wrap taps (frame edges, 360 seam).
    ycrop = next((b for b in aby.bands if b.kind == "crop"), None)
    xcrop = next((b for b in abx.bands if b.kind == "crop"), None)

    if ycrop is not None:
        jj = jnp.arange(ycrop.start, ycrop.end, dtype=jnp.int32)
        # What the crop actually read (self-consistent with base clipping).
        expect = (ybase[ycrop] - aby.pad_lo) + (jj - ycrop.start)
        sl = slice(ycrop.start, ycrop.end)
        bad = valid_y[sl] & (
            (pyc[sl] != expect) | ((pyc - pymc)[sl] != 1)
        )
        fy = jax.lax.top_k(jnp.where(bad, jj, jnp.int32(-1)), _FIX_K)[0]
        out = _fix_rows(out, frame, fy, pyc, pxc, pxmc, rect)

    if xcrop is not None:
        ii = jnp.arange(xcrop.start, xcrop.end, dtype=jnp.int32)
        if wrap_x:
            expect = jnp.mod(
                cx + jnp.asarray(gx[xcrop.start : xcrop.end], jnp.int32) + 1,
                ws,
            )
        else:
            expect = (xbase[xcrop] - abx.pad_lo) + (ii - xcrop.start)
        sl = slice(xcrop.start, xcrop.end)
        bad = valid_x[sl] & (
            (pxc[sl] != expect) | ((pxc - pxmc)[sl] != 1)
        )
        fx = jax.lax.top_k(jnp.where(bad, ii, jnp.int32(-1)), _FIX_K)[0]
        out = _fix_cols(out, frame, fx, pyc, pymc, pxc, rect)

    valid = (valid_y[:, None] & valid_x[None, :])[None]
    out = jnp.where(valid, out, jnp.uint8(0))
    if out_layout == "chw":
        return out
    return out.transpose(1, 2, 0)


def _fix_rows(out, frame, fy, pyc, pxc, pxmc, rect):
    """Recompute <= _FIX_K full output rows exactly via 1-D x prefixes.

    Fixed rows all have box height 1 (step-1 band; clamps collapse to
    height 1), so each box is an interval sum of one frame row:
    prefix-sum the gathered rows and difference at the exact elementwise
    taps (wrapped taps land in-range, so plain differences cover them).
    """
    ho = out.shape[1]
    safe = jnp.maximum(fy, 0)
    rows = jnp.take(frame, pyc[safe], axis=1).astype(jnp.uint32)  # (3,K,W)
    pref = jnp.pad(jnp.cumsum(rows, axis=2), ((0, 0), (0, 0), (1, 0)))
    box = jnp.take(pref, pxc + 1, axis=2) - jnp.take(pref, pxmc + 1, axis=2)
    vals = _exact_box_div(box, rect[safe][None]).astype(jnp.uint8)
    idx = jnp.where(fy < 0, ho, fy)  # -1 pads dropped
    return out.at[:, idx, :].set(vals, mode="drop")


def _fix_cols(out, frame, fx, pyc, pymc, pxc, rect):
    """Recompute <= _FIX_K full output columns exactly via 1-D y prefixes.

    Fixed columns have box width 1; each box is an interval sum of one
    frame column, differenced at the exact y taps.  Runs after
    ``_fix_rows``; both recompute from the frame with exact taps on both
    axes, so the overlap cells agree.
    """
    wo = out.shape[2]
    safe = jnp.maximum(fx, 0)
    cols = jnp.take(frame, pxc[safe], axis=2).astype(jnp.uint32)  # (3,H,K)
    pref = jnp.pad(jnp.cumsum(cols, axis=1), ((0, 0), (1, 0), (0, 0)))
    box = jnp.take(pref, pyc + 1, axis=1) - jnp.take(pref, pymc + 1, axis=1)
    vals = _exact_box_div(box, rect[:, safe][None]).astype(jnp.uint8)
    idx = jnp.where(fx < 0, wo, fx)
    return out.at[:, :, idx].set(vals, mode="drop")
