"""Fused Pallas unwarp kernels (slab-DMA + in-VMEM integer-weight dots).

The XLA "mm" unwarp (foveax/core/unwarp.py) replaced the gather engine
with slab dynamic-slices + MXU dots, but those slabs are materialized
through HBM — ~850 MB of bf16 per 16K frame for the column pass alone.
These kernels keep the same math (one exact integer-numerator dot per
axis, divide by the cell width) but DMA each gaze-positioned window
straight from HBM into VMEM and run the dot kernel-resident, so the only
full-size HBM traffic is the read of the y-blended intermediate and the
write of the output.  Same structure as the fused sampler
(foveax/kernels/segreduce.py); reference semantics are the inverse
bilinear unwarp of src/sat_decoder_interpolate_kernel.cl:1-151.

Geometry: the inverse log map's cell index advances 0-or-1 per output
pixel, so 128 consecutive output pixels span <= 129 source cells —
circularly contiguous across the 360 seam (the wrap jump lands exactly
at the frame boundary), which an input-side circular pad of the SMALL
reduced frame absorbs.  Per block the traced base (scalar prefetch)
anchors a statically-sized window; rare edge-collapse columns that
escape the window (the same jump/collapse cases the mm path repairs)
are fixed up post-kernel by the identical top_k scatter.

MXU exactness: pixels <= 255 and integer weights <= den <= 255 are
bf16-exact (the MXU truncates f32 operands to bf16), products and
2-term sums stay below 2^24, so the numerator dot is exact; the f32
divide is within 1 ulp and true quotients sit >= 1/den from integer
boundaries, keeping the <= 1 LSB contract of the mm path.  The column
pass adds +0.01 before truncation so a 1-ulp-low device divide cannot
truncate an exact integer quotient (the fovea) down.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foveax.kernels.dbuf import dbuf_slot

# Output cells per block: x blocks are the result's LANE dim (u8 tiles
# at 128 lanes), y blocks its SUBLANE dim (u8 tiles at 32 sublanes).
# _LX is the FLOOR x block width — production shapes widen it via
# _x_geom (below) to amortize the 128-lane alignment slack.
_LX = 128
_SY = 32
# DMA base quantum per axis (window starts snap down to this).  Mosaic
# requires DMA offsets provably divisible by the axis tiling on the
# real chip — (8, 128) for the last two dims — so the x pass (lane dim)
# must quantize to 128, not 8 ("Failed to prove that a tile index in
# dimension 2 is divisible by the tiling (128)", measured on-chip).
_QX = 128
_QY = 8
# Static slab widths: quantum-1 slack + max span (cells advance 0/1 per
# output pixel: lx+1 for x blocks, 33 for y blocks) + the hi tap + 1.
# _KY rounds up to the sublane tile (8); x slab widths are DMA SLICE
# SIZES along the lane dim and Mosaic requires those 128-aligned too
# ("Slice shape along dimension 2 must be aligned to tiling (128)") —
# at the floor lx=128: 127 + 129 + 2 = 258 rounds up to 384.
_KX = 384
_KY = 48
# Post-kernel fixup capacity for x columns that escape their window
# (wrap-jump and edge-collapse cases).  Dense all-integer-gaze sweeps
# measure a worst case of one full jump block per gaze (127 at lx=128),
# so the per-shape capacity is 2*lx (floor 256) and the invariant tests
# assert worst <= capacity // 2.
_FIX_K = 256


def _kx(lx: int) -> int:
    """x slab width for an lx-column block: quantum-1 slack (127) + max
    span (lx+1) + hi tap + 1, rounded up to the 128 lane tile."""
    return -(-(lx + 130) // 128) * 128


def _x_budget(hb: int, kx: int, lx: int) -> int:
    """Static per-step VMEM estimate of the x pass (bytes): two u8 slab
    slots + the per-channel f32 cast plane + one-hot weights + numdot/
    quotient f32 + the output block.  Conservative sizing against the
    ~16 MB scoped budget with its quirky accounting."""
    return (2 * 3 * hb * kx        # double-buffered u8 slabs
            + hb * kx * 4          # per-channel f32 cast plane
            + kx * lx * 4          # one-hot weight matrix
            + 2 * hb * lx * 4      # numdot + quotient f32
            + 3 * hb * lx)         # output block
_X_VMEM_CAP = 12 * 2**20  # the known-good 4K config (lx=128) sits at ~11.5 MB


def _hb(ho: int, kx: int = _KX, lx: int = _LX) -> int:
    """Row-block of the x pass: the whole height when the VMEM budget
    allows (a block spanning the full dim needs no tile alignment), else
    the largest 32-multiple divisor (u8 sublane tiling) under the
    budget.  Returns 0 when nothing fits (caller tries a smaller lx)."""
    if _x_budget(ho, kx, lx) <= _X_VMEM_CAP:
        return ho
    for d in range(1440, 31, -32):
        if d < ho and ho % d == 0 and _x_budget(d, kx, lx) <= _X_VMEM_CAP:
            return d
    return 0


def _x_candidates() -> tuple[tuple[int, int], ...]:
    """(lx, kx) candidate list for the x pass, best first.

    Three geometries, selectable via ``FOVEAX_UNWARP_GEOM`` (the
    same-window A/B knob for the relay's drifting absolute rates, and an
    emergency fallback):

    - ``shave`` (default): lx=128 with the slack tile SHAVED (kx=256
      instead of the guaranteed-coverage 384).  The one-hot dot's MXU
      work and the slab DMA bytes both scale with kx, so this cuts BOTH
      by 33%.  Coverage: rel <= lo[0]%128 + 127 and the hi tap add one,
      so only the wrap-jump block escapes — the SAME worst case as
      kx=384 (127 columns, one full jump block; swept over all integer
      gazes at every production shape) — and the existing fixup repairs
      it within the unchanged capacity.
    - ``wide``: amortize the slack over 512-column blocks (kx=768,
      1.5x bytes/cell) — fewer bytes than shave but 3x its dot FLOPs.
    - ``r3``: the round-3 guaranteed-coverage geometry (128/384).
    """
    import os

    mode = os.environ.get("FOVEAX_UNWARP_GEOM", "shave")
    if mode == "r3":
        return ((128, 384),)
    if mode == "wide":
        return tuple((lx, _kx(lx)) for lx in (512, 384, 256, 128))
    return ((128, 256),)


def _x_geom(out_w: int, out_h: int, red_w: int):
    """Pick (lx, kx, hb) for the x pass: the first candidate geometry
    whose block width divides out_w, whose slab fits the reduced width,
    and whose VMEM budget admits a legal row block.  Returns (0, 0, 0)
    when no geometry fits (callers raise the documented ValueError)."""
    cands = _x_candidates() + ((128, 384),)  # guaranteed floor
    for lx, kx in cands:
        if out_w % lx:
            continue
        if red_w < kx:
            continue
        hb = _hb(out_h, kx, lx)
        if hb:
            return lx, kx, hb
    return 0, 0, 0


def _block_geom(idx_lo, idx_hi, num, den, s_cells: int, src_dim: int,
                k: int, q: int, wrap: bool):
    """Per-block traced geometry: bases (nb,), rel/step/num/den (nb, S),
    plus the flat out-of-window mask (for the x fixup).

    Pad cells get (num, den) = (0, 1) weight-1 passthroughs.  Bases snap
    down to ``q``; out-of-window cells are neutralized in-kernel (rel 0,
    step 0) and repaired by the caller's fixup."""
    n = idx_lo.shape[0]
    nb = -(-n // s_cells)
    pad = nb * s_cells - n
    lo = jnp.pad(idx_lo, (0, pad), mode="edge").reshape(nb, s_cells)
    s = jnp.pad(idx_hi - idx_lo, (0, pad)).reshape(nb, s_cells)
    nm = jnp.pad(num, (0, pad)).reshape(nb, s_cells)
    dn = jnp.pad(den, (0, pad), constant_values=1).reshape(nb, s_cells)
    if wrap:
        base = (lo[:, 0] // q) * q
        rel = jnp.mod(lo - base[:, None], src_dim)
    else:
        base = jnp.clip(lo[:, 0], 0, max(src_dim - k, 0))
        base = (base // q) * q
        rel = lo - base[:, None]
    # In-window iff both taps fit: rel + s <= k - 1 (s = 0 at collapsed
    # edge cells, so rel = k - 1 alone is still valid).
    bad = (rel < 0) | (rel + s > k - 1)
    rel = jnp.where(bad, 0, rel)
    s = jnp.where(bad, 0, s)
    badf = bad.reshape(-1)[:n]
    # Metadata rides as (nb, 1, S): each program's (1, 1, S) block then
    # has its last two dims equal to the array's, which the Mosaic
    # block-mapping check requires (a (1, S) block over an (nb, S)
    # array fails the on-chip lowering that interpret mode never runs).
    # Bases ship PRE-DIVIDED by ``q``: the kernels re-multiply so the
    # DMA offset is a literal ``smem_value * q`` product that Mosaic's
    # divisibility prover accepts (a raw SMEM value, even host-
    # quantized, fails its tile-alignment check on the real chip).
    return (
        (base // q).astype(jnp.int32), rel.astype(jnp.int32)[:, None, :],
        s.astype(jnp.int32)[:, None, :], nm.astype(jnp.int32)[:, None, :],
        dn.astype(jnp.int32)[:, None, :], badf)


def _y_kernel(base_ref, lo_ref, s_ref, n_ref, d_ref, frame_hbm, out_ref,
              slab, sem, *, k, q, nby, int8, bias=0.5 + 2.0 ** -10):
    """One 32-row output block: DMA the (3, k, Wp) source row window
    (double-buffered: block i+1's window streams in behind block i's
    dots), blend via one exact integer-numerator dot per channel, divide
    by the cell width, round half-up, emit uint8."""
    i = pl.program_id(0)

    def copy(t2, sl):
        return pltpu.make_async_copy(
            frame_hbm.at[:, pl.ds(base_ref[t2] * q, k), :], slab.at[sl],
            sem.at[sl],
        )

    slot = dbuf_slot(copy, i, nby)
    lo = lo_ref[0, 0, :][:, None]
    s = s_ref[0, 0, :][:, None]
    nmi = n_ref[0, 0, :][:, None]
    dni = d_ref[0, 0, :][:, None]
    nm = nmi.astype(jnp.float32)
    dn = dni.astype(jnp.float32)
    ks = jax.lax.broadcasted_iota(jnp.int32, (_SY, k), 1)
    # One reciprocal per output ROW instead of a full-width f32 divide
    # per element: VPU divides are many-times-slower than multiplies and
    # this quotient runs once per output cell (round-5 ceiling work).
    # Exactness: q' = num x fl(1/dn) has |q' - q| <= q * 2^-22 <= 1e-4.
    # True quotients are multiples of 1/dn, so a non-half quotient sits
    # >= 1/(2*dn) >= 1/66 from the .5 rounding boundary (>> 1e-4 + bias)
    # and an exact-half quotient (round-half-up in the exact path) gets
    # the explicit +2^-10 bias, which clears the boundary past the error
    # without reaching the next 1/dn step.
    rdn = 1.0 / dn
    # MXU int8 path (FOVEAX_UNWARP_INT8, eligible when steps <= 127 —
    # every production grid): integer weights ride s8 directly, pixels
    # shift to x-128 via a sign-bit XOR, and the exact numerator is
    # numdot + 128*dn (the weight row sums to dn).  s32 accumulation is
    # exact; the quotient path is unchanged, so the <= 1 LSB contract
    # holds identically.  Also drops the u8->i32->f32 cast plane.
    if int8:
        oh8 = (
            jnp.where(ks == lo, dni - nmi, 0)
            + jnp.where(ks == lo + s, nmi, 0)
        ).astype(jnp.int8)
    else:
        oh = (
            jnp.where(ks == lo, dn - nm, 0.0)
            + jnp.where(ks == lo + s, nm, 0.0)
        )
    outs = []
    for c in range(3):
        if int8:
            x8 = (slab[slot, c, :, :] ^ jnp.uint8(128)).astype(jnp.int8)
            numi = jax.lax.dot_general(
                oh8, x8, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + 128 * dni  # (_SY, Wp) exact < 2^24
            outs.append(
                (numi.astype(jnp.float32) * rdn + bias)
                .astype(jnp.int32).astype(jnp.uint8)
            )
            continue
        x = slab[slot, c, :, :].astype(jnp.int32).astype(jnp.float32)
        numdot = jax.lax.dot_general(
            oh, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (_SY, Wp)
        outs.append(
            (numdot * rdn + bias).astype(jnp.int32).astype(jnp.uint8)
        )
    out_ref[...] = jnp.stack(outs)


def _x_kernel(base_ref, lo_ref, s_ref, n_ref, d_ref, rows_hbm, out_ref,
              slab, sem, *, k, q, hb, lx, nbx, nrb, int8, bias=0.01):
    """One (col-block, row-block) step: DMA the (3, hb, k) window of the
    y-blended intermediate (double-buffered ahead of the grid's
    row-major iteration order), one integer-numerator dot per channel,
    divide, truncate (+0.01 guards exact-integer quotients against a
    1-ulp-low device divide), emit uint8."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    def copy(t2, sl):
        ii, jj = t2 // nrb, jax.lax.rem(t2, nrb)
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(jj * hb, hb), pl.ds(base_ref[ii] * q, k)],
            slab.at[sl], sem.at[sl],
        )

    slot = dbuf_slot(copy, i * nrb + j, nbx * nrb)
    lo = lo_ref[0, 0, :][None, :]
    s = s_ref[0, 0, :][None, :]
    nmi = n_ref[0, 0, :][None, :]
    dni = d_ref[0, 0, :][None, :]
    nm = nmi.astype(jnp.float32)
    dn = dni.astype(jnp.float32)
    ks = jax.lax.broadcasted_iota(jnp.int32, (k, lx), 0)
    # One reciprocal per output COLUMN instead of a per-element divide
    # (see _y_kernel); the recip-multiply's relative error (<= 2^-22) is
    # far inside the existing +0.01 truncation guard's margin.
    rdn = 1.0 / dn
    # int8 variant: same scheme as _y_kernel (s8 weights, x-128 pixels,
    # +128*dn exact correction, s32 accumulation).
    if int8:
        oh8 = (
            jnp.where(ks == lo, dni - nmi, 0)
            + jnp.where(ks == lo + s, nmi, 0)
        ).astype(jnp.int8)
    else:
        oh = (
            jnp.where(ks == lo, dn - nm, 0.0)
            + jnp.where(ks == lo + s, nm, 0.0)
        )
    outs = []
    for c in range(3):
        if int8:
            x8 = (slab[slot, c, :, :] ^ jnp.uint8(128)).astype(jnp.int8)
            numi = jax.lax.dot_general(
                x8, oh8, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + 128 * dni  # (hb, lx) exact < 2^24
            outs.append(
                (numi.astype(jnp.float32) * rdn + bias)
                .astype(jnp.int32).astype(jnp.uint8)
            )
            continue
        x = slab[slot, c, :, :].astype(jnp.int32).astype(jnp.float32)
        numdot = jax.lax.dot_general(
            x, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (hb, _LX)
        outs.append((numdot * rdn + bias).astype(jnp.int32).astype(jnp.uint8))
    out_ref[...] = jnp.stack(outs)


def _unwarp_fused_xy(planar, out_w, out_h, ix_lo, ix_hi, nx, dx,
                     iy_lo, iy_hi, ny, dy, int8, out_layout, interpret):
    """Column-first fused unwarp (FOVEAX_UNWARP_ORDER=xy): the x pass
    runs on the wrap-padded REDUCED frame (hr rows instead of Ho — the
    dot-FLOP and byte saving), its jump fixup repairs the intermediate
    with round-half-up semantics, and the y pass finishes with the
    truncating +0.01 guard over the full output width."""
    from foveax.core.unwarp import _jump_fixup

    _, hr, wr = planar.shape
    lx = kx = hbx = 0
    for lxc, kxc in _x_candidates() + ((128, 384),):
        if out_w % lxc or wr < kxc:
            continue
        hbc = _hb(hr, kxc, lxc)
        if hbc:
            lx, kx, hbx = lxc, kxc, hbc
            break
    if not lx:
        raise ValueError(
            f"fused unwarp (xy): no legal x geometry for {out_w}x{out_h} "
            f"over reduced height {hr}"
        )

    # --- x pass: (3, hr, Wrp) -> (3, hr, Wo), round-half intermediate --
    wrp = -(-(wr + kx) // 128) * 128
    ppx = jnp.pad(planar, ((0, 0), (0, 0), (0, wrp - wr)), mode="wrap")
    bx, rx_lo, rx_s, rx_n, rx_d, badf = _block_geom(
        ix_lo, ix_hi, nx, dx, lx, wr, kx, _QX, wrap=True
    )
    nbx = out_w // lx
    nrbx = hr // hbx
    half_up = 0.5 + 2.0 ** -10
    xb = pl.pallas_call(
        functools.partial(
            _x_kernel, k=kx, q=_QX, hb=hbx, lx=lx, nbx=nbx, nrb=nrbx,
            int8=int8, bias=half_up,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbx, nrbx),
            in_specs=[
                _vec_spec(lx), _vec_spec(lx), _vec_spec(lx),
                _vec_spec(lx),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (3, hbx, lx), lambda i, j, *_: (0, j, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 3, hbx, kx), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, hr, out_w), jnp.uint8),
        interpret=interpret,
    )(bx, rx_lo, rx_s, rx_n, rx_d, ppx)
    xb = _jump_fixup(
        xb, planar, badf, ix_lo, ix_hi, nx, dx, max(_FIX_K, 2 * lx),
        bias=half_up,
        # xy geometry coverage swept per production width too
        # (test_swept_shapes_window_covers_every_gaze) — elide the
        # scatter fallback's cond here as at the yx/mm sites.
        assume_covered=True,
    )

    # --- y pass: (3, hr, Wo) -> (3, Ho, Wo), truncating final ----------
    ho_pad = -(-out_h // _SY) * _SY
    by, ry_lo, ry_s, ry_n, ry_d, _ = _block_geom(
        iy_lo, iy_hi, ny, dy, _SY, hr, _KY, _QY, wrap=False
    )
    nby = ho_pad // _SY
    out = pl.pallas_call(
        functools.partial(
            _y_kernel, k=_KY, q=_QY, nby=nby, int8=int8, bias=0.01
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nby,),
            in_specs=[
                _vec_spec(_SY), _vec_spec(_SY), _vec_spec(_SY),
                _vec_spec(_SY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (3, _SY, out_w), lambda i, *_: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 3, _KY, out_w), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, ho_pad, out_w), jnp.uint8),
        interpret=interpret,
    )(by, ry_lo, ry_s, ry_n, ry_d, xb)
    out = out[:, :out_h, :]
    return out if out_layout == "chw" else out.transpose(1, 2, 0)


def _vec_spec(s_cells):
    """Per-block (1, 1, S) scalar-vector spec over an (nb, 1, S) array,
    indexed by the first grid dim (``*_`` absorbs any further grid
    indices + prefetch refs).  The last two dims equal the array's, as
    the Mosaic block-mapping check requires."""
    return pl.BlockSpec(
        (1, 1, s_cells), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )


def unwarp_rect_fused(
    reduced: jax.Array,
    out_width: int,
    out_height: int,
    center: jax.Array,
    *,
    in_layout: str = "hwc",
    out_layout: str = "hwc",
    interpret: bool = False,
) -> jax.Array:
    """Unwarp a reduced uint8 frame to (out_height, out_width) via the
    fused Pallas pipeline — within 1 LSB of ``unwarp_rect(precision=
    "exact")``, fovea bit-exact (same contract as "mm").

    Requires: out_width a multiple of 128, reduced >= (_KY, _KX) and
    delta-LUT steps <= 255 (all production shapes qualify); raises
    ValueError otherwise — callers fall back to precision="mm".
    """
    from foveax.core.unwarp import _axis_vectors

    planar = reduced.transpose(2, 0, 1) if in_layout == "hwc" else reduced
    _, hr, wr = planar.shape
    if out_width % _LX:
        raise ValueError(f"fused unwarp needs out_width % {_LX} == 0")
    if hr < _KY or wr < _KX:
        raise ValueError(f"fused unwarp needs reduced >= ({_KY}, {_KX})")
    lx, kx, hb = _x_geom(out_width, out_height, wr)
    if not lx:
        # No (column-block, row-block) pair under the VMEM budget — fail
        # loudly here (the documented fall-back-to-"mm" contract) rather
        # than deep inside Mosaic compilation.
        raise ValueError(
            f"fused unwarp: no legal x geometry for {out_width}x"
            f"{out_height} (needs a 32-multiple row-block divisor under "
            "the VMEM budget)"
        )
    cx = (center[0] * jnp.float32(out_width)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(out_height)).astype(jnp.int32)
    ix_lo, ix_hi, _rx, nx, dx, msx = _axis_vectors(out_width, wr, cx, wrap=True)
    iy_lo, iy_hi, _ry, ny, dy, msy = _axis_vectors(out_height, hr, cy, wrap=False)
    if max(msx, msy) > 255:
        raise ValueError("fused unwarp needs delta steps <= 255")
    # MXU int8 dots (round-5 A/B knob): weights must fit s8, so the
    # path is eligible only when every delta step <= 127 (production
    # grids peak at ~23; the contract allows up to 255, where the bf16
    # path remains the fallback).
    import os

    # Default ON since the round-5 same-window ladder (2026-08-21
    # 06:10Z, 16K stage): xy+int8 4.50 < xy 4.64 < yx+int8 5.11 <
    # yx 5.38 ms (4K mirrors it); on-chip parity green for both knobs.
    int8 = (
        os.environ.get("FOVEAX_UNWARP_INT8", "1") == "1"
        and max(msx, msy) <= 127
    )
    # Pass order (round-5 A/B knob): "yx" (rows then columns, the
    # round-3 shipped order) or "xy" — columns FIRST, on the SMALL
    # reduced frame.  Bilinear blending is separable in either order;
    # commuting the passes moves the expensive column pass from the
    # tall (Ho, ~Wr) intermediate onto the (hr, ~Wr) reduced frame —
    # at 16K that is 113 + 38 GFLOP of one-hot dots instead of
    # 204 + 22 (the x dot runs over hr rows instead of Ho) and ~6%
    # fewer slab bytes.  The quantization roles swap with the passes
    # (the intermediate pass rounds half-up, the final pass truncates
    # with the +0.01 guard — the ``bias`` kernel params), so the
    # <= 1 LSB-of-exact / fovea-bit-exact contract argument is the
    # mirror image of the shipped order's.
    order = os.environ.get("FOVEAX_UNWARP_ORDER", "xy")
    if order == "xy":
        return _unwarp_fused_xy(
            planar, out_width, out_height, ix_lo, ix_hi, nx, dx,
            iy_lo, iy_hi, ny, dy, int8, out_layout, interpret,
        )

    # --- y pass: (3, hr, Wr) -> (3, Ho_pad32, Wp) u8 -------------------
    # The input-side circular pad (cheap: the reduced frame is small)
    # gives the x pass seam-crossing windows; the 32-row output padding
    # (pad cells replicate edge geometry) is never read by the x pass.
    # Wp rounds up to a 128 multiple: the y kernel DMAs the full lane
    # width per window and Mosaic requires DMA slice sizes 128-aligned
    # along the minor dim (extra pad columns are wrap duplicates no x
    # window reaches — windows end before base + kx <= wr + kx).
    wp = -(-(wr + kx) // 128) * 128
    pp = jnp.pad(planar, ((0, 0), (0, 0), (0, wp - wr)), mode="wrap")
    ho_pad = -(-out_height // _SY) * _SY
    by, ry_lo, ry_s, ry_n, ry_d, _ = _block_geom(
        iy_lo, iy_hi, ny, dy, _SY, hr, _KY, _QY, wrap=False
    )
    nby = ho_pad // _SY
    yb = pl.pallas_call(
        functools.partial(_y_kernel, k=_KY, q=_QY, nby=nby, int8=int8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nby,),
            in_specs=[
                _vec_spec(_SY), _vec_spec(_SY), _vec_spec(_SY),
                _vec_spec(_SY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (3, _SY, wp), lambda i, *_: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 3, _KY, wp), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, ho_pad, wp), jnp.uint8),
        interpret=interpret,
    )(by, ry_lo, ry_s, ry_n, ry_d, pp)

    # --- x pass: (3, Ho, W) from gaze-windowed column slabs ------------
    bx, rx_lo, rx_s, rx_n, rx_d, badf = _block_geom(
        ix_lo, ix_hi, nx, dx, lx, wr, kx, _QX, wrap=True
    )
    nbx = out_width // lx
    nrb = out_height // hb
    out = pl.pallas_call(
        functools.partial(
            _x_kernel, k=kx, q=_QX, hb=hb, lx=lx, nbx=nbx, nrb=nrb, int8=int8
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbx, nrb),
            in_specs=[
                _vec_spec(lx), _vec_spec(lx), _vec_spec(lx),
                _vec_spec(lx),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (3, hb, lx), lambda i, j, *_: (0, j, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 3, hb, kx), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, out_height, out_width), jnp.uint8),
        interpret=interpret,
    )(bx, rx_lo, rx_s, rx_n, rx_d, yb)

    # --- fixup: out-of-window columns (wrap-jump/edge-collapse cases),
    # the same exact blend the kernel computes, over placeholders.
    # Capacity scales with the block width: the worst measured escape is
    # one full jump block per gaze, so 2*lx keeps the half margin ------
    from foveax.core.unwarp import _jump_fixup

    ybv = yb[:, :out_height, :]
    out = _jump_fixup(
        out, ybv, badf, ix_lo, ix_hi, nx, dx, max(_FIX_K, 2 * lx),
        assume_covered=True,
    )

    return out if out_layout == "chw" else out.transpose(1, 2, 0)
