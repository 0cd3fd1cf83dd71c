"""Fused gaze-windowed segment-reduce sampling kernels (SAT-free).

The BENCHMARKS.md "16K roofline" showed that >= 30 fps at 16K requires
not materializing the 1.6 GB uint32 SAT; the XLA direct sampler
(foveax/core/direct.py) removed the SAT but pays for slab-stack
materialization + operand conversion around every one-hot dot, and its
dot FLOPs hit this environment's delivered XLA matmul rate at >= 8K.
These Pallas kernels fuse the reduction: the frame is DMA'd from HBM in
gaze-positioned windows straight into VMEM, the one-hot interval dot
runs on in-VMEM data, and only the reduced rows (y pass, uint16) reach
HBM.

Same box semantics as the SAT path (reference:
src/sat_decoder_sample_rect_kernel.cl:138-241): per output cell the box
is the source interval (tap_lo, tap_hi] per axis, taps from the exact
elementwise clamp/wrap rules (foveax.core.sample._axis_taps).  Output
cells tile into blocks of ``_S`` cells; each block's source window is a
statically-sized slab (the block's worst-case tap span, bucketed per
band like the direct sampler) whose traced base comes in via scalar
prefetch.  Edge blocks clip their base and the in-window offsets (VMEM
inputs) absorb the shift, so every cell's interval lands inside the
slab — the same invariant the direct sampler's tests sweep over all
integer gazes.

MXU exactness: uint8 pixels and 0/1 weights are bf16-exact and the f32
accumulation of integer products stays exact below 2^24 (max y-segment
sum 255*23 = 5,865; max box 255*23*23 = 134,895).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foveax.kernels.dbuf import dbuf_slot

# Output cells per block of the y pass (the dots' M dim and the output
# block's sublane count; uint16 tiles need multiples of 16).
_S = 32
# Output cells per block of the x pass (the result's LANE dim: uint8
# blocks tile at 128 lanes).
_SX = 128
# Slack on each band's slab width: a seam/edge straddle clamp displaces
# a block's base tap by at most the max grid step (23 at production
# sizes; swept in tests).
_SLACK = 32


def _dbuf_fits(k: int, minor: int, elem_bytes: int = 1) -> bool:
    """Static check: a double-buffered slab must stay within a
    conservative ~6 MB scoped-VMEM allowance (the largest periphery
    bands at 16K exceed it and fall back to a single serial-DMA slab).
    Cast/dot intermediates are chunk-bounded (_CH_Y/_CH_X below) and do
    not scale with k, so only the slab itself counts against k."""
    return 6 * elem_bytes * k * minor <= 6 * 1024 * 1024


# Rows (y pass) / columns (x pass) cast-and-dotted per chunk: the
# uint8/16 -> int32 -> float32 conversion hops materialize full planes
# in VMEM, and at production widths a whole-slab plane (k x 1920 x 8 B
# at 16K's k=728) would overrun the ~16 MB scoped-VMEM budget on its
# own.  Chunking bounds the live intermediates at ~2 MB while the f32
# accumulation stays exact (partial integer sums < 2^24).
_CH_Y = 128
_CH_X = 512


def _wb(w: int) -> int:
    """Width-block: largest 128-multiple divisor of ``w`` up to 2048
    (every production width divides by 1920)."""
    for d in (2048, 1920, 1536, 1280, 1024, 768, 640, 512, 384, 256, 128):
        if w % d == 0:
            return d
    raise ValueError(f"width {w} not a multiple of 128")


@dataclasses.dataclass(frozen=True)
class _KBand:
    start: int  # first output cell
    end: int  # last output cell (exclusive)
    k: int  # static slab width per cell block

    def blocks(self, s_cells: int) -> int:
        return -(-(self.end - self.start) // s_cells)


@functools.lru_cache(maxsize=64)
def _kernel_bands(
    g_bytes: bytes, dim: int, s_cells: int, quantum: int = 8
) -> tuple[_KBand, ...]:
    """Static band split (blocks of ``s_cells``) with per-band slab widths.

    Blocks are bucketed by their 64-rounded worst-case span (consecutive
    equal buckets merge into one band), so foveal blocks (span ==
    s_cells) never pay for the exponential periphery's windows.
    ``quantum`` extends each window for base-alignment slack: DMA window
    starts quantize down to tile boundaries (8 sublanes for the y pass's
    row windows, 128 lanes for the x pass's column windows).
    """
    g = np.frombuffer(g_bytes, dtype=np.int64)
    d = np.diff(g)
    n = g.shape[0] - 1
    blocks = list(range(0, n, s_cells))
    # Per-block slack: a straddle clamp displaces the base tap by at
    # most the block's OWN max step (not the global 23 — foveal blocks
    # need 1), plus quantum-1 for base alignment.  k must stay a quantum
    # multiple so the non-wrap clip bound (src_dim - k) remains
    # base-aligned — otherwise an edge block's quantized base falls
    # short of covering the last cells.
    ks = []
    for bs in blocks:
        be = min(bs + s_cells, n)
        span = int(g[be] - g[bs])
        step = int(d[bs:be].max())
        need = span + step + quantum - 1 + 1
        ks.append(min(-(-need // quantum) * quantum, dim))
    # Bucket for band grouping (coarse key keeps the band count small);
    # each band's k is the exact max within its group.
    keys = [-(-k // 64) * 64 for k in ks]
    bands = []
    gs = 0
    for i in range(1, len(blocks) + 1):
        if i == len(blocks) or keys[i] != keys[gs]:
            end = blocks[i] if i < len(blocks) else n
            bands.append(_KBand(blocks[gs], end, max(ks[gs:i])))
            gs = i
    return tuple(bands)


def _band_k(g, d, start: int, end: int, s: int, quantum: int, dim: int) -> int:
    """Worst-case slab width for [start, end) tiled into blocks of ``s``
    (same per-block formula as _kernel_bands: span + own max step +
    quantum-1 slack + 1, quantum-rounded, clamped to the dim)."""
    ks = []
    for bs in range(start, end, s):
        be = min(bs + s, end)
        span = int(g[be] - g[bs])
        step = int(d[bs:be].max())
        need = span + step + quantum - 1 + 1
        ks.append(min(-(-need // quantum) * quantum, dim))
    return max(ks)


# Static worst-case minor dims for the widening rule below — decisions
# must be shape-stable (the invariant sweeps mirror them), so the VMEM
# fit uses these caps rather than the call-time minor: y slabs are
# (k, wb<=2048) uint8, x slabs (hb<=256, k) uint16.
_MINOR_CAP_Y = 2048
_MINOR_CAP_X = 256


@functools.lru_cache(maxsize=64)
def _adaptive_bands(
    g_bytes: bytes, dim: int, s_small: int, quantum: int,
    minor_cap: int, elem_bytes: int,
) -> tuple[tuple[_KBand, int], ...]:
    """Band split with PER-BAND block widths: (band, s_cells) pairs.

    Low-span bands — the fovea and near-fovea, where the quantum-1
    alignment slack dominates the slab (e.g. a 384-wide window for 128
    foveal cells that need ~130 columns) — widen their blocks 2-4x to
    amortize the slack, cutting the slab DMA bytes per output cell; the
    exponential periphery keeps ``s_small`` (its windows are span-bound
    and already near 1 byte/cell, and wider blocks there would blow the
    slab budget).  A band widens only when the total slab bytes strictly
    improve AND the widened slab still double-buffers within the VMEM
    allowance at the worst-case minor dim.

    ``FOVEAX_SEGREDUCE_WIDEN=0`` disables widening (round-3 banding) —
    the same-window A/B knob and emergency fallback."""
    import os

    bands = _kernel_bands(g_bytes, dim, s_small, quantum)
    if os.environ.get("FOVEAX_SEGREDUCE_WIDEN", "1") == "0":
        return tuple((b, s_small) for b in bands)
    g = np.frombuffer(g_bytes, dtype=np.int64)
    d = np.diff(g)
    out = []
    for band in bands:
        pick = (band, s_small)
        for s in (4 * s_small, 2 * s_small):
            k = _band_k(g, d, band.start, band.end, s, quantum, dim)
            nb = -(-(band.end - band.start) // s)
            if (
                k * nb < band.k * band.blocks(s_small)
                and _dbuf_fits(k, minor_cap, elem_bytes)
            ):
                pick = (_KBand(band.start, band.end, k), s)
                break
        out.append(pick)
    return tuple(out)


def _block_geometry(
    band: _KBand, lo1, hi1, src_dim: int, wrap: bool, s_cells: int,
    quantum: int = 8,
):
    """Traced geometry for one band: bases (nb,), rel_lo/rel_hi (nb, S).

    Cells are the +1-shifted tap intervals [lo1, hi1); the last block's
    pad cells get zero-width intervals.  Bases quantize DOWN to
    ``quantum`` so the kernels' DMA windows start on tile boundaries
    (the band k carries matching slack).
    """
    nb = band.blocks(s_cells)
    pad = nb * s_cells - (band.end - band.start)
    lo = jnp.pad(lo1[band.start : band.end], (0, pad), mode="edge")
    hi = jnp.pad(hi1[band.start : band.end], (0, pad), mode="edge")
    if pad:
        hi = hi.at[band.end - band.start :].set(lo[band.end - band.start :])
    lo = lo.reshape(nb, s_cells)
    hi = hi.reshape(nb, s_cells)
    if wrap and band.k >= src_dim:
        # Whole-period window: k was clamped to the dim, which discarded
        # the quantum slack — a quantized nonzero base would then leave a
        # circular block's tail outside [base, base+k).  Anchor at 0
        # instead: rel = lo mod dim and every interval end hi1 <= dim = k,
        # so coverage is unconditional (and no wrap pad is consumed).
        base = jnp.zeros_like(lo[:, 0])
        rel_lo = jnp.mod(lo, src_dim)
    elif wrap:
        base = (jnp.mod(lo[:, 0], src_dim) // quantum) * quantum
        rel_lo = jnp.mod(lo - base[:, None], src_dim)
    else:
        base = jnp.clip(lo[:, 0], 0, max(src_dim - band.k, 0))
        base = (base // quantum) * quantum
        rel_lo = lo - base[:, None]
    # Metadata rides as (nb, 1, S) so each program's (1, 1, S) block has
    # its last two dims equal to the array's — Mosaic rejects (1, S)
    # blocks over an (nb, S) array when nb isn't the block's sublane
    # count (the on-chip lowering check interpret mode never runs).
    # Bases ship PRE-DIVIDED by the quantum: the kernels re-multiply so
    # the DMA offset is a literal ``smem_value * quantum`` product, which
    # Mosaic's divisibility prover accepts — a raw SMEM value (even one
    # the host quantized) fails its "tile index divisible by the tiling"
    # check on the real chip.
    rel_hi = rel_lo + (hi - lo)
    return (
        (base // quantum).astype(jnp.int32),
        rel_lo.astype(jnp.int32)[:, None, :],
        rel_hi.astype(jnp.int32)[:, None, :],
    )


def _y_kernel(base_ref, va_ref, lo_ref, hi_ref, frame_hbm, out_ref, slab,
              sem, *, k, q, s, wb, w, nb, nwb, dbuf, int8):
    """One (row-block, width-block) step: DMA the (3, k, wb) source
    window, one-hot dot the rows into ``s`` segment sums, emit uint16.

    Width blocks past w/wb wrap to the frame's left edge ((j*wb) % w) —
    they write the 360 wrap pad the x pass's windows read through.
    When ``dbuf`` (static, chosen by VMEM budget) the next block's
    window streams in behind this block's dots (two slab slots).

    ``va_ref`` (scalar prefetch, (nb,)) is the per-row-block any-cell-
    valid flag: the log-rect grid statically covers ~2x the frame, so at
    any single gaze about half the periphery cells are off-frame and
    masked downstream — their blocks skip BOTH the window DMA and the
    dots and emit zeros (the x pass's validity mask never reads them)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    def copy(t2, sl):
        ii, jj = t2 // nwb, jax.lax.rem(t2, nwb)
        # rem(jj, w//wb) * wb == rem(jj*wb, w) since wb | w — but keeps
        # the lane offset a provable multiple of wb (>= the 128 tile).
        col = jax.lax.rem(jj, w // wb) * wb
        return pltpu.make_async_copy(
            frame_hbm.at[:, pl.ds(base_ref[ii] * q, k), pl.ds(col, wb)],
            slab.at[sl],
            sem.at[sl],
        )

    def act(t2):
        return va_ref[t2 // nwb] != 0

    t = i * nwb + j
    if dbuf:
        slot = dbuf_slot(copy, t, nb * nwb, active=act)
    else:
        slot = 0

        @pl.when(act(t))
        def _():
            dma = copy(t, 0)
            dma.start()
            dma.wait()

    # One-hot interval weights: oh[s, r] = 1 iff slab row r lies in cell
    # s's interval.  Zero-width pad cells give all-zero rows.  The cast
    # and dot run in _CH_Y-row chunks so the i32/f32 conversion planes
    # stay ~2 MB regardless of the band's k; chunk partial sums are
    # exact integers < 2^24, so f32 accumulation is exact.
    #
    # ``int8`` (FOVEAX_SEGREDUCE_INT8, round-5 ceiling work): the same
    # dot on the MXU's int8 path (measured 310 TOP/s vs 183 TF bf16,
    # BENCHMARKS.md "delivered ceilings").  Pixels shift to x-128 (an
    # XOR of the sign bit, so both operands fit s8: weights are 0/1),
    # the s32-accumulated dot is exact, and the shift is undone by
    # +128*(hi-lo) per cell — the interval width is exactly the number
    # of ones in the cell's one-hot row (windows cover every interval:
    # the invariant the sweeps pin).  Bit-identical by construction,
    # and it drops the per-chunk u8->i32->f32 VPU cast planes.
    @pl.when(act(t))
    def _():
        lo = lo_ref[0, 0, :][:, None]
        hi = hi_ref[0, 0, :][:, None]
        outs = []
        for c in range(3):
            if int8:
                acc = jnp.zeros((s, wb), jnp.int32)
                for j0 in range(0, k, _CH_Y):
                    j1 = min(j0 + _CH_Y, k)
                    ks = j0 + jax.lax.broadcasted_iota(
                        jnp.int32, (s, j1 - j0), 1
                    )
                    oh = ((ks >= lo) & (ks < hi)).astype(jnp.int8)
                    x = (slab[slot, c, j0:j1, :] ^ jnp.uint8(128)).astype(
                        jnp.int8
                    )
                    acc = acc + jax.lax.dot_general(
                        oh,
                        x,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )  # (s, wb)
                outs.append((acc + 128 * (hi - lo)).astype(jnp.uint16))
                continue
            y = jnp.zeros((s, wb), jnp.float32)
            for j0 in range(0, k, _CH_Y):
                j1 = min(j0 + _CH_Y, k)
                ks = j0 + jax.lax.broadcasted_iota(jnp.int32, (s, j1 - j0), 1)
                oh = ((ks >= lo) & (ks < hi)).astype(jnp.float32)
                x = slab[slot, c, j0:j1, :].astype(jnp.int32).astype(
                    jnp.float32
                )
                y = y + jax.lax.dot_general(
                    oh,
                    x,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (s, wb)
            outs.append(y.astype(jnp.int32).astype(jnp.uint16))
        out_ref[...] = jnp.stack(outs)

    @pl.when(jnp.logical_not(act(t)))
    def _():
        out_ref[...] = jnp.zeros((3, s, wb), jnp.uint16)


def y_segment_reduce(
    frame: jax.Array,
    lo1: jax.Array,
    hi1: jax.Array,
    grid_g: np.ndarray,
    *,
    valid: jax.Array | None = None,
    pad_blocks: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """(3, H, W) uint8 + exact y tap intervals -> uint16 segment rows
    (3, Hr, W + pad_blocks*wb).

    Row j of the result is the sum of frame rows [lo1[j], hi1[j)) — the
    y half of the 4-tap box filter (height-1 intervals pass raw pixel
    rows through, so the foveal crop needs no special case).  With
    ``pad_blocks`` extra width blocks, the columns past W repeat the
    frame's left edge — the 360 wrap pad for the x pass, written as
    fresh kernel output instead of a post-hoc XLA concat copy.

    ``grid_g`` is the CONCRETE int64 grid vector (band geometry is
    host-computed); ``lo1``/``hi1`` are traced.  ``valid`` (traced
    (Hr,) bool) marks cells whose output the x pass's validity mask
    keeps: row blocks with NO valid cell skip their window DMA and dots
    entirely and emit zeros (the grid statically covers ~2x the frame,
    so at any gaze roughly half the periphery blocks skip).
    """
    out = y_segment_reduce_batch(
        frame,
        lo1[None],
        hi1[None],
        grid_g,
        valid=None if valid is None else valid[None],
        pad_blocks=pad_blocks,
        interpret=interpret,
    )
    return out[:, 0]


def y_segment_reduce_batch(
    frame: jax.Array,
    lo1s: jax.Array,
    hi1s: jax.Array,
    grid_g: np.ndarray,
    *,
    valid: jax.Array | None = None,
    pad_blocks: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Gaze-batched y pass: N gazes' tap intervals (N, Hr) against ONE
    shared frame -> (3, N, Hr, Wp) in a single kernel invocation per
    band (the gaze axis rides the grid: per-gaze block metadata is
    concatenated along the block axis, so the kernel is byte-for-byte
    the single-gaze one — round 5's launch-amortization lever for the
    serving knee, reference: src/video_server.cc:62-85's per-connection
    engine stacks -> batched launches)."""
    _, hs, ws = frame.shape
    ng = lo1s.shape[0]
    wb = _wb(ws)
    n = grid_g.shape[0] - 1
    # Quantized DMA bases need an 8-aligned clip bound: with an unaligned
    # height, clip(lo, 0, hs - k) quantized DOWN can leave the window up
    # to 7 rows short of a bottom-clamped cell's interval end (found by
    # differential fuzzing at non-production heights; every production
    # height is a multiple of 8 and skips this).  Pad rows are never
    # selected: intervals end at hs <= hp, and rel_hi = hi - base keeps
    # every one-hot column below the pad.
    import os

    if os.environ.get("FOVEAX_SEGREDUCE_GATE", "1") == "0":
        valid = None
    hp = -(-hs // 8) * 8
    if hp != hs:
        frame = jnp.pad(frame, ((0, 0), (0, hp - hs), (0, 0)))
    bands = _adaptive_bands(grid_g.tobytes(), hp, _S, 8, _MINOR_CAP_Y, 1)
    nwb = ws // wb + pad_blocks
    outs = []
    for band, s in bands:
        base, rel_lo, rel_hi = jax.vmap(
            lambda lo, hi: _block_geometry(
                band, lo, hi, hp, wrap=False, s_cells=s, quantum=8
            )
        )(lo1s, hi1s)
        nb = band.blocks(s)
        pad = nb * s - (band.end - band.start)
        base = base.reshape(ng * nb)
        rel_lo = rel_lo.reshape(ng * nb, 1, s)
        rel_hi = rel_hi.reshape(ng * nb, 1, s)
        if valid is None:
            va = jnp.ones((ng * nb,), jnp.int32)
        else:
            va = (
                jnp.pad(
                    valid[:, band.start : band.end].astype(jnp.int32),
                    ((0, 0), (0, pad)),
                )
                .reshape(ng * nb, s)
                .max(axis=1)
            )
        dbuf = _dbuf_fits(band.k, wb)
        out = pl.pallas_call(
            functools.partial(
                _y_kernel, k=band.k, q=8, s=s, wb=wb, w=ws, nb=ng * nb,
                nwb=nwb, dbuf=dbuf,
                int8=os.environ.get("FOVEAX_SEGREDUCE_INT8", "0") == "1",
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(ng * nb, nwb),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, s), lambda i, j, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, s), lambda i, j, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (3, s, wb),
                    lambda i, j, *_: (0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM(((2 if dbuf else 1), 3, band.k, wb), jnp.uint8),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (3, ng * nb * s, nwb * wb), jnp.uint16
            ),
            interpret=interpret,
        )(base, va, rel_lo, rel_hi, frame)
        outs.append(
            out.reshape(3, ng, nb * s, nwb * wb)[
                :, :, : band.end - band.start, :
            ]
        )
    full = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)
    return full[:, :, :n, :]


def _hb(hr: int) -> int:
    """Row-block of the x pass: largest 8-multiple divisor of Hr <= 256."""
    for d in range(256, 7, -8):
        if hr % d == 0:
            return d
    if hr <= 512:
        return hr
    raise ValueError(f"height {hr} has no 8-multiple row-block divisor")


def _x_kernel(
    base_ref, va_ref, vya_ref, lo_ref, hi_ref, vx_ref, rows_hbm, dy_ref,
    vy_ref, out_ref, slab, sem, *, k, q, s, hb, nb, nhb, dbuf, nbg, hr, int8
):
    """One (cell-block, row-block) step: DMA the (3, hb, k) segment-row
    window (double-buffered when the VMEM budget allows), limb-split
    one-hot dots into ``s`` box sums, divide exactly by the rect, mask
    validity, emit uint8.

    ``va_ref`` (per cell-block) / ``vya_ref`` (per row-block) are the
    any-valid flags: a step whose cells are all invalid OR whose rows
    are all invalid emits exactly the zeros the validity mask would
    force, skipping both the window DMA and the dots (at any single
    gaze roughly half the grid's static 2x coverage is off-frame)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    # Gaze-batched grids flatten the cell-block axis to ng*nbg and stack
    # the per-gaze segment rows along rows_hbm's row axis (stride hr);
    # single-gaze calls pass nbg = nb, making g identically 0.
    def copy(t2, sl):
        ii, jj = t2 // nhb, jax.lax.rem(t2, nhb)
        g = ii // nbg
        return pltpu.make_async_copy(
            rows_hbm.at[
                :, pl.ds(g * hr + jj * hb, hb), pl.ds(base_ref[ii] * q, k)
            ],
            slab.at[sl],
            sem.at[sl],
        )

    def act(t2):
        ii, jj = t2 // nhb, jax.lax.rem(t2, nhb)
        return (va_ref[ii] != 0) & (vya_ref[(ii // nbg) * nhb + jj] != 0)

    t = i * nhb + j
    if dbuf:
        slot = dbuf_slot(copy, t, nb * nhb, active=act)
    else:
        slot = 0

        @pl.when(act(t))
        def _():
            dma = copy(t, 0)
            dma.start()
            dma.wait()

    @pl.when(act(t))
    def _():
        lo = lo_ref[0, 0, :][None, :]  # (1, s)
        hi = hi_ref[0, 0, :][None, :]

        # rect = dy * dx; dx is each cell's interval width.  Validity
        # masks come in as int32 (Mosaic-friendly); invalid texels emit 0.
        dx = (hi - lo).astype(jnp.float32)  # (1, s)
        dy = dy_ref[:, 0][:, None].astype(jnp.float32)  # (hb, 1)
        rect_f = dy * dx
        rect_u = rect_f.astype(jnp.int32).astype(jnp.uint32)
        # Separable reciprocal: hb + s divides instead of hb*s per
        # channel (VPU divides are many-times-slower than multiplies).
        # (1/dy)(1/dx) carries <= 2 ulp of extra rounding vs 1/(dy*dx) —
        # well inside the +-1 tolerance of the wraparound fixup below.
        # Masked cells can have dx = 0 (inf recip): the quotient is
        # masked to 0 by `valid` below, and inf*0 NaN never forms
        # because box sums over empty intervals are exactly 0.0, and
        # 0 * inf... guard anyway by clamping the empty-interval width.
        rrect = (1.0 / jnp.maximum(dy, 1.0)) * (1.0 / jnp.maximum(dx, 1.0))
        valid = (vy_ref[:, 0][:, None] > 0) & (vx_ref[0, 0, :][None, :] > 0)

        outs = []
        for c in range(3):
            # uint16 segment sums exceed bf16's exact integers (the MXU
            # truncates f32 operands to bf16): two <=8-bit limb dots,
            # exact.  Chunked over _CH_X slab columns so the cast/limb
            # planes stay ~2 MB at any band k; chunk partials are exact
            # ints < 2^24.
            #
            # ``int8``: the SAME two limb dots on the MXU's int8 path
            # (1.7x the bf16 rate, BENCHMARKS.md).  The hi limb
            # (v >> 8 <= 22) fits s8 directly; the lo limb shifts to
            # (v & 255) - 128 via a sign-bit XOR and the shift is
            # undone by +128*dx per cell (dx ones per one-hot column).
            # s32 accumulation is exact; bit-identical by construction.
            if int8:
                acc = jnp.zeros((hb, s), jnp.int32)
                for j0 in range(0, k, _CH_X):
                    j1 = min(j0 + _CH_X, k)
                    ks = j0 + jax.lax.broadcasted_iota(
                        jnp.int32, (j1 - j0, s), 0
                    )
                    oh = ((ks >= lo) & (ks < hi)).astype(jnp.int8)
                    xs = slab[slot, c, :, j0:j1]
                    # No shifts: Mosaic cannot legalize arith.shrui on
                    # this toolchain (on-chip failure 2026-08-21, the
                    # one op that blocked the whole sampler int8 path).
                    # Split via AND + exact f32 multiply instead:
                    # xs - (xs & 255) is a multiple of 256 <= 65280, so
                    # *(1/256) is exact in f32.
                    xi = xs.astype(jnp.int32)
                    lo16 = xi & 255
                    xhi8 = (
                        ((xi - lo16).astype(jnp.float32) * (1.0 / 256.0))
                        .astype(jnp.int32)
                        .astype(jnp.int8)
                    )
                    xlo8 = (lo16 ^ 128).astype(jnp.int8)

                    def dot8(a, oh=oh):
                        return jax.lax.dot_general(
                            a,
                            oh,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )

                    acc = acc + 256 * dot8(xhi8) + dot8(xlo8)
                box_i = acc + 128 * (hi - lo)  # exact int < 2^24
                box_f = box_i.astype(jnp.float32)
                box_u = box_i.astype(jnp.uint32)
                q0 = (box_f * rrect).astype(jnp.int32).astype(jnp.uint32)
                rem = box_u - q0 * rect_u
                wrapped = rem >= jnp.uint32(0x80000000)
                over = (~wrapped) & (rem >= rect_u)
                qq = q0 + over.astype(jnp.uint32) - wrapped.astype(jnp.uint32)
                qq = jnp.where(valid, qq, jnp.uint32(0))
                outs.append(qq.astype(jnp.int32).astype(jnp.uint8))
                continue
            box_f = jnp.zeros((hb, s), jnp.float32)
            for j0 in range(0, k, _CH_X):
                j1 = min(j0 + _CH_X, k)
                ks = j0 + jax.lax.broadcasted_iota(
                    jnp.int32, (j1 - j0, s), 0
                )
                oh = ((ks >= lo) & (ks < hi)).astype(jnp.float32)
                x = slab[slot, c, :, j0:j1].astype(jnp.int32).astype(
                    jnp.float32
                )
                xhi = jnp.floor(x * (1.0 / 256.0))
                xlo = x - 256.0 * xhi

                def dot(a, oh=oh):
                    return jax.lax.dot_general(
                        a,
                        oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                box_f = box_f + 256.0 * dot(xhi) + dot(xlo)  # exact < 2^24
            box_u = box_f.astype(jnp.int32).astype(jnp.uint32)
            # Exact box/rect division: f32 quotient estimate + one-step
            # wraparound fixup (foveax.core.sample._exact_box_div).
            # Estimate via the separable recip-multiply; the fixup
            # corrects any +-1 estimate error, so exactness is unchanged
            # by construction.
            q0 = (box_f * rrect).astype(jnp.int32).astype(jnp.uint32)
            rem = box_u - q0 * rect_u
            wrapped = rem >= jnp.uint32(0x80000000)
            over = (~wrapped) & (rem >= rect_u)
            qq = q0 + over.astype(jnp.uint32) - wrapped.astype(jnp.uint32)
            qq = jnp.where(valid, qq, jnp.uint32(0))
            outs.append(qq.astype(jnp.int32).astype(jnp.uint8))
        out_ref[...] = jnp.stack(outs)

    @pl.when(jnp.logical_not(act(t)))
    def _():
        out_ref[...] = jnp.zeros((3, hb, s), jnp.uint8)


def x_segment_reduce(
    rows: jax.Array,
    lo1: jax.Array,
    hi1: jax.Array,
    valid_x: jax.Array,
    valid_y: jax.Array,
    dy: jax.Array,
    grid_g: np.ndarray,
    src_w: int,
    *,
    wrap: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """(3, Hr, Wp) uint16 segment rows -> (3, Hr, Wr) uint8 reduced frame.

    Column i of the result is the box mean over row-sum columns
    [lo1[i], hi1[i]) divided by the exact rect, with the validity mask
    applied — the x half of the 4-tap box filter plus the output stage.
    ``rows`` must carry a wrap pad of at least the largest PARTIAL-band
    window when ``wrap`` (y_segment_reduce's ``pad_blocks``); whole-
    period bands anchor at base 0 and never read the pad.
    """
    out = x_segment_reduce_batch(
        rows[:, None],
        lo1[None],
        hi1[None],
        valid_x[None],
        valid_y[None],
        dy[None],
        grid_g,
        src_w,
        wrap=wrap,
        interpret=interpret,
    )
    return out[:, 0]


def x_segment_reduce_batch(
    rows: jax.Array,
    lo1s: jax.Array,
    hi1s: jax.Array,
    valid_x: jax.Array,
    valid_y: jax.Array,
    dy: jax.Array,
    grid_g: np.ndarray,
    src_w: int,
    *,
    wrap: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Gaze-batched x pass: ``rows`` (3, N, Hr, Wp) per-gaze segment
    rows (y_segment_reduce_batch output), per-gaze metadata (N, ...) ->
    (3, N, Hr, Wr) in ONE kernel invocation per band (the gaze axis
    rides the grid; the kernel decodes the gaze from the flattened
    cell-block index for its DMA row offset and validity lookups)."""
    _, ng, hr, wp = rows.shape
    rows = rows.reshape(3, ng * hr, wp)
    hb = _hb(hr)
    nhb = hr // hb
    n = grid_g.shape[0] - 1
    bands = _adaptive_bands(grid_g.tobytes(), src_w, _SX, 128, _MINOR_CAP_X, 2)
    dy2 = dy.astype(jnp.int32).reshape(ng * hr, 1)
    vy2 = valid_y.astype(jnp.int32).reshape(ng * hr, 1)
    # Per-row-block any-valid flags: row-block stripes whose y cells are
    # all off-frame let every (cell-block, row-block) step in the stripe
    # skip its window DMA (the y pass already wrote zeros there).
    # FOVEAX_SEGREDUCE_GATE=0 disables all validity-gated skipping (the
    # same-window A/B knob and emergency fallback).
    import os

    gate = os.environ.get("FOVEAX_SEGREDUCE_GATE", "1") != "0"
    vya = valid_y.astype(jnp.int32).reshape(ng * nhb, hb).max(axis=1)
    if not gate:
        vya = jnp.ones_like(vya)
    outs = []
    for band, s in bands:
        base, rel_lo, rel_hi = jax.vmap(
            lambda lo, hi: _block_geometry(
                band, lo, hi, src_w, wrap=wrap, s_cells=s, quantum=128
            )
        )(lo1s, hi1s)
        nbg = band.blocks(s)
        nb = ng * nbg
        base = base.reshape(nb)
        rel_lo = rel_lo.reshape(nb, 1, s)
        rel_hi = rel_hi.reshape(nb, 1, s)
        pad = nbg * s - (band.end - band.start)
        vxf = jnp.pad(
            valid_x[:, band.start : band.end].astype(jnp.int32),
            ((0, 0), (0, pad)),
        )
        vx = vxf.reshape(nb, 1, s)
        va = vxf.reshape(nb, s).max(axis=1)
        if not gate:
            va = jnp.ones_like(va)
        dbuf = _dbuf_fits(band.k, hb, 2)
        out = pl.pallas_call(
            functools.partial(
                _x_kernel, k=band.k, q=128, s=s, hb=hb, nb=nb,
                nhb=nhb, dbuf=dbuf, nbg=nbg, hr=hr,
                int8=os.environ.get("FOVEAX_SEGREDUCE_INT8", "0") == "1",
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nb, nhb),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, s), lambda i, j, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, s), lambda i, j, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, s), lambda i, j, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        (hb, 1),
                        lambda i, j, *_, nbg=nbg, nhb=nhb: (
                            (i // nbg) * nhb + j, 0
                        ),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (hb, 1),
                        lambda i, j, *_, nbg=nbg, nhb=nhb: (
                            (i // nbg) * nhb + j, 0
                        ),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (3, hb, s),
                    lambda i, j, *_, nbg=nbg, nhb=nhb: (
                        0, (i // nbg) * nhb + j, jax.lax.rem(i, nbg)
                    ),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM(
                        ((2 if dbuf else 1), 3, hb, band.k), jnp.uint16
                    ),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((3, ng * hr, nbg * s), jnp.uint8),
            interpret=interpret,
        )(base, va, vya, rel_lo, rel_hi, vx, rows, dy2, vy2)
        outs.append(
            out.reshape(3, ng, hr, nbg * s)[:, :, :, : band.end - band.start]
        )
    full = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=3)
    return full[:, :, :, :n]


def sample_rect_fused_batch(
    frame: jax.Array,
    grid,
    centers: jax.Array,
    *,
    wrap_x: bool = True,
    in_layout: str = "chw",
    out_layout: str = "hwc",
    interpret: bool = False,
) -> jax.Array:
    """N gazes against one shared frame, one kernel invocation per band
    (round 5): the gaze axis rides the Pallas GRID — per-gaze block
    metadata concatenates along the block axis, outputs stack along a
    gaze-major row axis — so N gazes amortize every per-invocation cost
    (semaphores, grid setup) that made the round-4 ``lax.map`` marginal
    ~0.13 ms/client.  Memory is bounded by chunking: groups of
    ``FOVEAX_BATCH_GRID_CHUNK`` (default 32) gazes run per grid batch,
    scanned with ``lax.map`` (each chunk materializes chunk x one
    intermediate rows plane).

    MEASURED NEGATIVE at the serving shape (on-chip same-window A/B,
    2026-08-21 04:05Z): grid-batched 42.15 ms vs ``lax.map`` 35.92 at
    1080p x 240 gazes (and 9.90 vs 9.58 at x 64) — the launch
    amortization does not pay; the per-gaze kernel invocations were
    already cheap and the concatenated-block grid loses DMA locality
    between gazes sharing a band.  The round-4 ``lax.map`` path is
    therefore the DEFAULT; ``FOVEAX_BATCH_GRID=1`` opts back into the
    grid path (kept tested + fuzz-covered, same policy as
    ``kernels/fused_select.py``).

    ``centers``: (N, 2) traced f32; output batched like
    :func:`foveax.core.direct.sample_rect_direct_batch`.
    """
    import os

    if in_layout == "hwc":
        frame = frame.transpose(2, 0, 1)
    if os.environ.get("FOVEAX_BATCH_GRID", "0") != "1":
        return jax.lax.map(
            lambda c: sample_rect_fused(
                frame, grid, c, wrap_x=wrap_x, in_layout="chw",
                out_layout=out_layout, interpret=interpret,
            ),
            centers,
        )
    n = centers.shape[0]
    chunk = max(1, int(os.environ.get("FOVEAX_BATCH_GRID_CHUNK", "32")))
    if n <= chunk:
        out = _sample_rect_fused_grid(
            frame, grid, centers, wrap_x=wrap_x, interpret=interpret
        )  # (3, n, Hr, Wr)
    else:
        groups = -(-n // chunk)
        padded = jnp.concatenate(
            [centers, jnp.broadcast_to(centers[-1:], (groups * chunk - n, 2))]
        ).reshape(groups, chunk, 2)
        outs = jax.lax.map(
            lambda cs: _sample_rect_fused_grid(
                frame, grid, cs, wrap_x=wrap_x, interpret=interpret
            ),
            padded,
        )  # (groups, 3, chunk, Hr, Wr)
        out = outs.transpose(1, 0, 2, 3, 4).reshape(
            3, groups * chunk, outs.shape[3], outs.shape[4]
        )[:, :n]
    if out_layout == "chw":
        return out.transpose(1, 0, 2, 3)
    return out.transpose(1, 2, 3, 0)


def _sample_rect_fused_grid(
    frame: jax.Array,
    grid,
    centers: jax.Array,
    *,
    wrap_x: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """One grid-batched fused launch set: (3, H, W) frame + (n, 2)
    centers -> (3, n, Hr, Wr).  Metadata is the vmapped single-gaze
    math; the kernels are the single-gaze ones over an n-times grid."""
    from foveax.core.sample import _axis_taps

    _, hs, ws = frame.shape
    cxs = (centers[:, 0] * jnp.float32(ws)).astype(jnp.int32)
    cys = (centers[:, 1] * jnp.float32(hs)).astype(jnp.int32)
    pxc, pxmc, valid_x, _, _ = jax.vmap(
        lambda cx: _axis_taps(grid.gx, cx, ws, wrap=wrap_x)
    )(cxs)
    pyc, pymc, valid_y, _, _ = jax.vmap(
        lambda cy: _axis_taps(grid.gy, cy, hs, wrap=False)
    )(cys)
    gx = np.asarray(grid.gx, dtype=np.int64)
    gy = np.asarray(grid.gy, dtype=np.int64)

    wb = _wb(ws)
    partial_ks = [
        b.k
        for b, _s in _adaptive_bands(gx.tobytes(), ws, _SX, 128, _MINOR_CAP_X, 2)
        if b.k < ws
    ]
    pad_blocks = -(-max(partial_ks) // wb) if (wrap_x and partial_ks) else 0
    rows = y_segment_reduce_batch(
        frame, pymc + 1, pyc + 1, gy, valid=valid_y, pad_blocks=pad_blocks,
        interpret=interpret,
    )
    return x_segment_reduce_batch(
        rows,
        pxmc + 1,
        pxc + 1,
        valid_x,
        valid_y,
        pyc - pymc,
        gx,
        ws,
        wrap=wrap_x,
        interpret=interpret,
    )


def sample_rect_fused(
    frame: jax.Array,
    grid,
    center: jax.Array,
    *,
    wrap_x: bool = True,
    in_layout: str = "chw",
    out_layout: str = "hwc",
    interpret: bool = False,
) -> jax.Array:
    """Foveate via the fused Pallas pipeline: bit-identical to
    ``sample_rect_from_sat(build_sat(frame), grid, center)`` for centers
    in [0, 1]^2 (the exact elementwise taps drive the kernels' one-hot
    weights, so clamp/wrap semantics hold per cell with no fixups).
    """
    from foveax.core.sample import _axis_taps

    if in_layout == "hwc":
        frame = frame.transpose(2, 0, 1)
    _, hs, ws = frame.shape
    cx = (center[0] * jnp.float32(ws)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(hs)).astype(jnp.int32)
    pxc, pxmc, valid_x, _, _ = _axis_taps(grid.gx, cx, ws, wrap=wrap_x)
    pyc, pymc, valid_y, _, _ = _axis_taps(grid.gy, cy, hs, wrap=False)
    gx = np.asarray(grid.gx, dtype=np.int64)
    gy = np.asarray(grid.gy, dtype=np.int64)

    wb = _wb(ws)
    # Wrap pad sizing: whole-period bands (k == ws) are anchored at base
    # 0 by _block_geometry and read only [0, ws), so they consume no
    # pad — size it from the widest partial-period band instead (at
    # small widths the periphery's k clamps to ws, and counting it
    # would double the y pass's output width for columns nobody reads).
    partial_ks = [
        b.k
        for b, _s in _adaptive_bands(gx.tobytes(), ws, _SX, 128, _MINOR_CAP_X, 2)
        if b.k < ws
    ]
    pad_blocks = -(-max(partial_ks) // wb) if (wrap_x and partial_ks) else 0
    rows = y_segment_reduce(
        frame, pymc + 1, pyc + 1, gy, valid=valid_y, pad_blocks=pad_blocks,
        interpret=interpret,
    )
    out = x_segment_reduce(
        rows,
        pxmc + 1,
        pxc + 1,
        valid_x,
        valid_y,
        pyc - pymc,
        gx,
        ws,
        wrap=wrap_x,
        interpret=interpret,
    )
    if out_layout == "chw":
        return out
    return out.transpose(1, 2, 0)


def fused_eligible(
    grid, src_h: int, src_w: int, *, wrap_x: bool = True, batch: bool = False
) -> bool:
    """One shared structural-eligibility probe for the fused sampler:
    trace it with ``jax.eval_shape`` (no compile, no device) and report
    whether the shape satisfies the kernels' contracts.  The single
    source of truth for every ``auto`` policy — the pipeline's
    batch_pair, the perf CLI, and the serve startup validation — so the
    policies cannot drift apart again (the perf CLI's auto did exactly
    that between rounds 3 and 4)."""
    fn = sample_rect_fused_batch if batch else sample_rect_fused
    centers = (
        jax.ShapeDtypeStruct((4, 2), jnp.float32)
        if batch
        else jax.ShapeDtypeStruct((2,), jnp.float32)
    )
    try:
        jax.eval_shape(
            lambda f, c: fn(f, grid, c, wrap_x=wrap_x, in_layout="chw"),
            jax.ShapeDtypeStruct((3, src_h, src_w), jnp.uint8),
            centers,
        )
        return True
    except ValueError:
        return False
