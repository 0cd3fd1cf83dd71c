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

- the ``step == 1`` run ("crop"): box extent is exactly 1 on that axis
  even under clamping (``pc = clip(p+1, 1, dim-1)`` and ``pmc = clip(p,
  0, pc-1)`` collapse to adjacent values), so the band is a gather of
  source rows / a window slice of columns — no arithmetic (a fovea box
  is one pixel);
- up to two periphery runs ("mm"): box sums become tiled one-hot MXU
  matmuls, the same slab pattern as the mm unwarp (core/unwarp.py): each
  tile of ``_T_L`` output cells contracts a ``K``-wide source slab
  (``K`` = the tile's static worst-case tap span + clamp slack) against
  0/1 interval weights built from the exact per-element clamped/wrapped
  tap vectors (the same ``_axis_taps`` as the SAT path) — clamp and
  360-wrap semantics hold elementwise, no fixups in these bands.  Edge
  tiles clip their slab base at the frame boundary and the weights
  (built from the clipped bases) absorb the shift.

The pipeline is y-stage then x-stage per y-band:
  crop rows -> row gather (box height 1) -> x-stage on raw uint8 rows
  mm rows   -> tiled y-dots over the full width -> x-stage on row sums
with the x-stage being a window slice for the x-crop band (the y-stage
rows are wrap-padded on the right by a few hundred columns, turning
mod-W window positions into plain offsets) and tiled x-dots for the
x-mm bands.

Operand exactness on the MXU (which truncates operands to bf16): uint8
pixels (<= 255) and 0/1 weights are bf16-exact; products accumulate in
f32 (exact for integer sums < 2^24; the largest box is 255*23*23 =
134,895).  The y-stage box-row sums (<= 255*23 = 5,865, not bf16-exact)
are split into two exact <=8-bit limb planes before the x-dots — the
same trick as the scan kernel's chunk-offset matmul.

The crop band's positional map disagrees with the elementwise tap rules
only at frame-edge clamps and the 360 seam (<= ``_FIX_K`` rows/columns
per axis over all integer gazes — swept in tests, same methodology as the
shared-tap sampler); those rows/columns are recomputed exactly from 1-D
prefix sums and scattered over the result.
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

# Output cells per matmul tile (the dots' lane dim; same scale as the mm
# unwarp's _MM_L).  _T_SLACK covers clamp displacement of a tile's base
# tap (a seam/edge straddle moves it by at most the max grid step, 23 at
# production sizes; swept in tests).
_T_L = 120
_T_SLACK = 26


@dataclasses.dataclass(frozen=True)
class _Band:
    kind: str  # "crop" | "mm"
    start: int  # first output cell (inclusive)
    end: int  # last output cell (exclusive)
    k: int  # mm: static slab width per tile (0 for crop)

    @property
    def n(self) -> int:
        return self.end - self.start

    @property
    def tiles(self) -> int:
        return -(-self.n // _T_L)


@functools.lru_cache(maxsize=64)
def _axis_bands(g_bytes: bytes, dim: int) -> tuple[_Band, ...]:
    """Static band split for one axis from its grid vector ``g`` (N+1,)."""
    g = np.frombuffer(g_bytes, dtype=np.int64)
    d = np.diff(g)
    n = d.shape[0]

    from foveax.core.sample import longest_run

    c0, c1 = longest_run(d == 1)

    def mm(start: int, end: int) -> list[_Band]:
        """Split [start, end) into mm sub-bands at tile boundaries,
        grouping consecutive tiles whose slack-padded span rounds to the
        same 128-bucket: a single uniform K would be the LAST tile's
        span (the steps grow exponentially outward), making every inner
        tile's slab and dot pay for the outermost window — bucketing
        cuts sum(tiles * K), the dots' byte/FLOP driver, by 30-50% at
        production sizes."""
        tiles = list(range(start, end, _T_L))
        # Coarser buckets at large dims bound the sub-band count (each
        # sub-band is one einsum + slab stack in the compiled graph).
        gran = 128 if dim <= 4096 else 256
        ks = [
            min(
                -(
                    -(int(g[min(ts + _T_L, end)] - g[ts]) + _T_SLACK) // gran
                )
                * gran,
                dim,
            )
            for ts in tiles
        ]
        out = []
        gs = 0
        for i in range(1, len(tiles) + 1):
            if i == len(tiles) or ks[i] != ks[gs]:
                out.append(
                    _Band(
                        "mm",
                        tiles[gs],
                        end if i == len(tiles) else tiles[i],
                        ks[gs],
                    )
                )
                gs = i
        return out

    if c1 - c0 >= _MIN_CROP and g[c0] < 0:
        bands = []
        if c0 > 0:
            bands.extend(mm(0, c0))
        bands.append(_Band("crop", c0, c1, 0))
        if c1 < n:
            bands.extend(mm(c1, n))
        return tuple(bands)
    return tuple(mm(0, n))


def _mm_dt():
    # CPU XLA has no MXU (and slow bf16 dots); f32 is exact for all the
    # integer magnitudes here (module docstring) on both backends.
    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


def _tile_geometry(band: _Band, lo1, hi1, src_dim: int, wrap: bool):
    """Traced slab bases (t,) and 0/1 weights (t, K, _T_L) for one band.

    ``lo1``/``hi1`` are the +1-shifted exact tap vectors (box = source
    interval [lo1, hi1); SAT differences are (tap, tap'] boxes).  Pad
    cells beyond the band get zero-width intervals (all-zero columns).
    """
    t = band.tiles
    pad = t * _T_L - band.n
    lo_b = jnp.pad(lo1[band.start : band.end], (0, pad), mode="edge")
    hi_b = jnp.pad(hi1[band.start : band.end], (0, pad), mode="edge")
    if pad:
        hi_b = hi_b.at[band.n :].set(lo_b[band.n :])  # zero-width pads
    lo_t = lo_b.reshape(t, _T_L)
    hi_t = hi_b.reshape(t, _T_L)
    if wrap:
        base = jnp.mod(lo_t[:, 0], src_dim)
        rel_lo = jnp.mod(lo_t - base[:, None], src_dim)
    else:
        base = jnp.clip(lo_t[:, 0], 0, max(src_dim - band.k, 0))
        rel_lo = lo_t - base[:, None]
    rel_hi = rel_lo + (hi_t - lo_t)
    k_iota = jnp.arange(band.k, dtype=jnp.int32)[None, :, None]
    w = (k_iota >= rel_lo[:, None, :]) & (k_iota < rel_hi[:, None, :])
    return base, w.astype(_mm_dt())


def _y_band_dot(src, band: _Band, base, w):
    """Tiled y-contraction: (3, H, W) u8 -> (3, n_out, W) f32 row sums.

    Slab windows clip at the frame edges (see _tile_geometry); weights
    absorb the shift, so the frame needs no y padding.
    """
    _, _, wsrc = src.shape
    dt = _mm_dt()
    slab = jax.vmap(
        lambda b: jax.lax.dynamic_slice(src, (0, b, 0), (3, band.k, wsrc))
    )(base).astype(dt)  # (t, 3, K, W)
    a = jnp.einsum(
        "tckw,tkl->ctlw", slab, w, preferred_element_type=jnp.float32
    )
    return a.reshape(3, band.tiles * _T_L, wsrc)[:, : band.n, :]


def _x_band_dot(rows_pad, band: _Band, base, w, limb: bool):
    """Tiled x-contraction: (3, ny, Wp) -> (3, ny, n_out) f32.

    ``rows_pad`` (uint8 for the y-crop band, f32 row sums for mm bands)
    is wrap-padded on the right by >= band.k columns, so windows anchored
    at mod-W bases never clip.  Slabs are sliced in the source dtype and
    cast (or limb-split: the f32 row sums are integers < 2^16, not
    bf16-exact) per slab, keeping the sliced traffic narrow.
    """
    _, h, _ = rows_pad.shape
    dt = _mm_dt()
    slab = jax.vmap(
        lambda b: jax.lax.dynamic_slice(rows_pad, (0, 0, b), (3, h, band.k))
    )(base)  # (t, 3, H, K) in source dtype

    def dot(plane):
        return jnp.einsum(
            "tchk,tkl->chtl",
            plane.astype(dt),
            w,
            preferred_element_type=jnp.float32,
        )

    if limb:
        hi = jnp.floor(slab * (1.0 / 256.0))
        out = 256.0 * dot(hi) + dot(slab - 256.0 * hi)
    else:
        out = dot(slab)
    return out.reshape(3, h, band.tiles * _T_L)[:, :, : band.n]


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
    if isinstance(grid.gx, jax.core.Tracer):
        raise TypeError(
            "sample_rect_direct needs a CONCRETE grid (its band geometry "
            "is host-computed from the grid vectors); close over the grid "
            "instead of passing it through jit/vmap as a traced argument"
        )
    if in_layout == "hwc":
        frame = frame.transpose(2, 0, 1)
    _, hs, ws = frame.shape
    cx = (center[0] * jnp.float32(ws)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(hs)).astype(jnp.int32)

    pxc, pxmc, valid_x, _, _ = _axis_taps(grid.gx, cx, ws, wrap=wrap_x)
    pyc, pymc, valid_y, _, _ = _axis_taps(grid.gy, cy, hs, wrap=False)
    # Box = source interval [tap_lo+1, tap_hi+1) per axis (SAT diffs are
    # (lo, hi] boxes).
    ylo1, yhi1 = pymc + 1, pyc + 1
    xlo1, xhi1 = pxmc + 1, pxc + 1

    gx = np.asarray(grid.gx, dtype=np.int64)
    gy = np.asarray(grid.gy, dtype=np.int64)
    xbands = _axis_bands(gx.tobytes(), ws)
    ybands = _axis_bands(gy.tobytes(), hs)
    xcrop = next((b for b in xbands if b.kind == "crop"), None)
    ycrop = next((b for b in ybands if b.kind == "crop"), None)

    # Right pad for the x-stage: the x-crop window and every x-mm slab
    # must fit past a mod-W base.  Wrap copies when wrap_x (mod-W window
    # positions become plain offsets), zeros otherwise (clamped cells in
    # the pad region are invalid or fixups).
    xpad = max([b.k for b in xbands] + [xcrop.n + 1 if xcrop else 1])

    def pad_right(rows):
        # Without wrap nothing reads past ws: mm bases clip to
        # [0, ws - k] and the x-crop band gathers — skip the pad copy.
        if wrap_x:
            return jnp.concatenate([rows, rows[:, :, :xpad]], axis=2)
        return rows

    if xcrop is not None:
        if wrap_x:
            bx = cx + jnp.int32(int(gx[xcrop.start])) + 1
            xcrop_base = jnp.mod(bx, ws)
        else:
            # Without wrap a clipped window base would shift the whole
            # band's content (unbounded mismatches); gather the exact
            # hi-tap columns instead (clipped cells are invalid/fixups).
            xcrop_idx = jnp.clip(
                cx
                + jnp.asarray(gx[xcrop.start + 1 : xcrop.end + 1], jnp.int32),
                0,
                ws - 1,
            )
    xgeo = {
        b: _tile_geometry(b, xlo1, xhi1, ws, wrap_x)
        for b in xbands
        if b.kind == "mm"
    }

    rect = ((pyc - pymc)[:, None] * (pxc - pxmc)[None, :]).astype(jnp.uint32)

    def x_stage(rows, yb: _Band, limb: bool):
        """Apply the x bands to one y-band's rows.

        ``rows``: (3, ny, W) — uint8 source rows for the y-crop band
        (boxes are single pixels on y), f32 box-row sums for mm bands.
        Returns the assembled uint8 output block (3, ny, n_total_x).
        """
        rows_pad = pad_right(rows)
        blocks = []
        for xb in xbands:
            if xb.kind == "crop":
                if wrap_x:
                    box = jax.lax.dynamic_slice(
                        rows_pad,
                        (jnp.int32(0), jnp.int32(0), xcrop_base),
                        (3, rows.shape[1], xb.n),
                    )
                else:
                    box = jnp.take(rows, xcrop_idx, axis=2)
                if yb.kind == "crop":
                    blocks.append(box)  # box == pixel, rect == 1
                    continue
            else:
                base, w = xgeo[xb]
                box = _x_band_dot(rows_pad, xb, base, w, limb)
            r = rect[yb.start : yb.end, xb.start : xb.end][None]
            blocks.append(
                _exact_box_div(box.astype(jnp.uint32), r).astype(jnp.uint8)
            )
        return (
            blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=2)
        )

    row_blocks = []
    for yb in ybands:
        if yb.kind == "crop":
            # Box height is 1 and the band's source rows are CONSECUTIVE
            # (hi taps step by 1): one dynamic_slice, shift-corrected by
            # a traced roll when the window clips at a frame edge (u8 row
            # gathers are element-rate-bound on the gather engine — 15x
            # slower than this slice+roll at 8K).  Rolled-in rows are
            # garbage only where cells are invalid or clamp fixups.
            raw = cy + jnp.int32(int(gy[yb.start + 1]))
            clipped = jnp.clip(raw, 0, max(hs - yb.n, 0))
            rows = jax.lax.dynamic_slice(
                frame, (jnp.int32(0), clipped, jnp.int32(0)), (3, yb.n, ws)
            )
            rows = jnp.roll(rows, clipped - raw, axis=1)
            row_blocks.append(x_stage(rows, yb, limb=False))
        else:
            base, w = _tile_geometry(yb, ylo1, yhi1, hs, wrap=False)
            a = _y_band_dot(frame, yb, base, w)  # (3, ny, W) f32
            row_blocks.append(x_stage(a, yb, limb=True))
    out = (
        row_blocks[0]
        if len(row_blocks) == 1
        else jnp.concatenate(row_blocks, axis=1)
    )

    # Crop-band fixups: rows/columns where the positional map disagrees
    # with the elementwise clamp/wrap taps (frame edges, 360 seam).
    if ycrop is not None:
        jj = jnp.arange(ycrop.start, ycrop.end, dtype=jnp.int32)
        expect = cy + jnp.asarray(
            gy[ycrop.start + 1 : ycrop.end + 1], jnp.int32
        )
        sl = slice(ycrop.start, ycrop.end)
        bad = valid_y[sl] & ((pyc[sl] != expect) | ((pyc - pymc)[sl] != 1))
        fy = jax.lax.top_k(jnp.where(bad, jj, jnp.int32(-1)), _FIX_K)[0]
        out = _fix_rows(out, frame, fy, pyc, pxc, pxmc, rect)

    if xcrop is not None:
        ii = jnp.arange(xcrop.start, xcrop.end, dtype=jnp.int32)
        raw = cx + jnp.asarray(gx[xcrop.start + 1 : xcrop.end + 1], jnp.int32)
        expect = jnp.mod(raw, ws) if wrap_x else raw
        sl = slice(xcrop.start, xcrop.end)
        bad = valid_x[sl] & ((pxc[sl] != expect) | ((pxc - pxmc)[sl] != 1))
        fx = jax.lax.top_k(jnp.where(bad, ii, jnp.int32(-1)), _FIX_K)[0]
        out = _fix_cols(out, frame, fx, pyc, pymc, pxc, rect)

    valid = (valid_y[:, None] & valid_x[None, :])[None]
    out = jnp.where(valid, out, jnp.uint8(0))
    if out_layout == "chw":
        return out
    return out.transpose(1, 2, 0)


def sample_rect_direct_batch(
    frame: jax.Array,
    grid: LogRectGrid,
    centers: jax.Array,
    *,
    wrap_x: bool = True,
    in_layout: str = "chw",
    out_layout: str = "hwc",
) -> jax.Array:
    """N gazes against one shared frame, no SAT: vmap over the gaze axis.

    The SAT batch path (``build_sat`` once + vmapped
    ``sample_rect_from_sat``) amortizes the SAT build but pays N
    gather-heavy samples whose random-access working set set the
    measured 48-client knee (BENCHMARKS.md "The knee, measured").  This
    path pays N slab-dot samples with NO gathers: per-gaze cost is
    higher at N=1, but the batched einsums lift the dots' M dim toward
    the MXU tile and the traffic is streaming slices, so throughput
    scales with N instead of kneeing on the gather engine.  The
    crossover is measured on chip (``perf --clients --batch-sampler``).
    reference: src/video_server.cc:62-85 — per-connection engine stacks,
    replaced here by one batched launch (foveax's founding design bet).

    ``centers``: (N, 2) traced f32.  Returns (N, Hr, Wr, 3) for
    ``out_layout="hwc"`` (the serve tick's encode layout), (N, 3, Hr,
    Wr) for ``"chw"``.
    """
    if in_layout == "hwc":
        frame = frame.transpose(2, 0, 1)
    return jax.vmap(
        lambda c: sample_rect_direct(
            frame, grid, c, wrap_x=wrap_x, in_layout="chw",
            out_layout=out_layout,
        )
    )(centers)


def _fix_rows(out, frame, fy, pyc, pxc, pxmc, rect):
    """Recompute <= _FIX_K full output rows exactly via 1-D x prefixes.

    Fixed rows all have box height 1 (step-1 band; clamps collapse to
    height 1), so each box is an interval sum of one frame row (the hi
    tap row): prefix-sum the gathered rows and difference at the exact
    elementwise taps (wrapped taps land in-range, so plain differences
    cover them too).
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

    Fixed columns have box width 1 (the hi tap column); each box is an
    interval sum of one frame column, differenced at the exact y taps.
    Runs after ``_fix_rows``; both recompute from the frame with exact
    taps on both axes, so the overlap cells agree.
    """
    wo = out.shape[2]
    safe = jnp.maximum(fx, 0)
    cols = jnp.take(frame, pxc[safe], axis=2).astype(jnp.uint32)  # (3,H,K)
    pref = jnp.pad(jnp.cumsum(cols, axis=1), ((0, 0), (1, 0), (0, 0)))
    box = jnp.take(pref, pyc + 1, axis=1) - jnp.take(pref, pymc + 1, axis=1)
    vals = _exact_box_div(box, rect[:, safe][None]).astype(jnp.uint8)
    idx = jnp.where(fx < 0, wo, fx)
    return out.at[:, :, idx].set(vals, mode="drop")
