"""Inverse log-rectilinear unwarp (the client-side hot op).

For every full-resolution output pixel: invert the log map to find the
enclosing reduced-frame texel, then bilinearly blend the two enclosing log
cells per axis with edge clamping (reference:
src/sat_decoder_interpolate_kernel.cl:1-151, host
src/sat_decoder.cc:887-928, CPU twin :618-772).

TPU-native design: the inverse map is separable like the forward one — every
quantity (u, min_u/max_u, min_x/max_x, ratios, the wrap flag) depends on only
one output axis.  foveax computes all of them as O(W_out)+O(H_out) 1-D
vectors, then performs two row gathers + column indexing on the small
reduced frame.  The whole op is dense vector math driven by two traced gaze
scalars — no recompilation as the gaze moves.  Internals are channel-planar
(3, H, W): a trailing size-3 channel axis would waste 125/128 vector lanes.

Exact-snap elimination: the reference kernel special-cases pixels where the
forward map lands exactly back on the pixel (a point copy instead of the
bilinear blend, src/sat_decoder_interpolate_kernel.cl:67-72).  That branch
is *provably redundant* given the cell construction: when d == d_calc the
pixel sits on the lo or hi cell boundary, the blend ratio is exactly 0 or 1,
and the bilinear mix of uint8 corners (integers, exact in float32)
degenerates to the same point copy bit-for-bit.  foveax therefore computes
only the blend — verified bit-identical against the explicit-snap variant
at 4K across gazes, and against the float64 golden (which keeps the
reference's explicit branch) in tests.

Precision note: the reference mixes float and double in the snap check
(2.0 vs 2.0f literals, src/sat_decoder_interpolate_kernel.cl:59 vs :80);
foveax derives the forward deltas from the same float64 LUT the sampling
grid uses (see foveax.core.logrect.delta64) so both directions of the
transform agree exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from foveax.core.logrect import delta_table
from foveax.core.logrect import lam as _lam

# Matmul-slab unwarp ("mm" precision) tiling: _MM_L output pixels per
# tile select from a _MM_K-wide contiguous source window.  The inverse
# log map's cell index advances by 0 or 1 per output pixel (the reduced
# frame is smaller than the output, so the map is a contraction) with ONE
# circular jump per gaze on the wrap axis — so a 120-wide output tile
# spans at most 120 source cells, and idx+1 (the hi tap) stays inside a
# 128 window anchored at the tile minimum.  Jump-tile columns overflow
# the window and are repaired by a bounded top_k fixup (at most _MM_L - 1
# of them per gaze; same pattern as the sample's shared-tap fixup,
# foveax/core/sample.py).
_MM_L = 120
_MM_K = 128
_MM_FIX_K = 128


def _mm_dtype():
    # CPU XLA lacks the bf16 dot kernels (and has no MXU to feed); the
    # f32 fallback keeps the code path testable in the CPU-only suite.
    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


def _mm_int_weights(k_iota, o, s, num, den, maxstep: int):
    """Integer bilinear weights: den-num at o, num at o+s — the blend
    lo + (hi-lo)*num/den scaled by den, so ONE dot computes the exact
    integer numerator and an elementwise divide by den finishes the
    blend.  All quantities are exact on the MXU: pixels <= 255 and
    weights <= den <= maxstep are bf16-exact when maxstep <= 255 (true
    at every production size — delta-LUT steps peak at ~23), products
    and <= 2-term sums stay below 2^24 (f32-exact).  When s == 0
    (edge-collapsed cell) both terms land on the same k and sum to
    exactly den, so collapsed cells pass the pixel through bit-exactly.

    Returns a list of weight tensors: one when maxstep <= 255; for
    larger (non-production) grids, two exact 8-bit limb planes
    (w = 256*w_hi8 + w_lo8, each bf16-exact) keep the same contract."""
    dt = _mm_dtype()
    w = jnp.where(k_iota == o, den - num, 0) + jnp.where(k_iota == o + s, num, 0)
    if maxstep <= 255 or dt == jnp.float32:
        return [w.astype(dt)], 1
    hi8 = w // 256
    return [(w - 256 * hi8).astype(dt), hi8.astype(dt)], 256


def _mm_tiles(idx_lo, idx_hi, num, den, out_dim, maxstep: int):
    """Per-tile slab bases, integer blend weights, and denominators for
    one axis.  Pad cells get (num, den) = (0, 1): a weight-1 passthrough
    of the base row/column, sliced off after the dot."""
    t = -(-out_dim // _MM_L)
    pad = t * _MM_L - out_dim
    lo_p = jnp.pad(idx_lo, (0, pad), mode="edge")
    s_p = jnp.pad(idx_hi - idx_lo, (0, pad))           # steps in {0, 1}
    n_p = jnp.pad(num, (0, pad))
    d_p = jnp.pad(den, (0, pad), constant_values=1)
    lo_t = lo_p.reshape(t, _MM_L)
    base = lo_t.min(axis=1)                            # (t,) traced
    off = lo_t - base[:, None]
    bad = off > (_MM_K - 2)                            # jump-tile overflow
    k_iota = jnp.arange(_MM_K, dtype=jnp.int32)[None, :, None]
    o = jnp.where(bad, 0, off)[:, None, :]
    s = s_p.reshape(t, _MM_L)[:, None, :]
    n = n_p.reshape(t, _MM_L)[:, None, :]
    d = d_p.reshape(t, _MM_L)[:, None, :]
    ws, scale = _mm_int_weights(k_iota, o, s, n, d, maxstep)
    den_t = d_p.reshape(t, _MM_L).astype(jnp.float32)  # (t, L)
    return t, base, bad, ws, scale, den_t


def _fixup_blend(yb, cols, ix_lo, ix_hi, nx, dx, bias=0.0):
    """Exact integer blend for the given output columns: two column
    gathers from the y-blended intermediate + the rational weights.
    ``bias`` selects the quantization the repaired pass used: 0.0 for
    the final truncating pass (default), 0.5 + 2^-10 when the repaired
    pass is a round-half-up intermediate (x-first order)."""
    left = jnp.take(yb, ix_lo[cols], axis=2).astype(jnp.float32)
    right = jnp.take(yb, ix_hi[cols], axis=2).astype(jnp.float32)
    nf = nx[cols].astype(jnp.float32)[None, None, :]
    df = dx[cols].astype(jnp.float32)[None, None, :]
    return ((left * (df - nf) + right * nf) / df + bias).astype(jnp.uint8)


# Output widths where dense integer-gaze sweeps proved the windowed
# repair covers EVERY escaped column for the yx fused and mm paths (the
# kernels snap the gaze to integer pixels, so integer sweeps are
# exhaustive); the scatter fallback is statically elided there (its
# lax.cond costs a full extra output copy even when never taken —
# 1.17 ms at 16K, scripts/unwarp_diag3.py 2026-08-21).  Geometry-level
# coverage is re-asserted by test_unwarp.py's sweep regression.
_SWEPT_FULL_COVER = frozenset({1920, 3840, 7680, 15360})


def _window_select(badf, ix_lo, ix_hi, w_src: int, fix_k: int):
    """Two-sided window geometry shared by _jump_fixup and the coverage
    sweep regression (single source of truth for the selection math the
    _SWEPT_FULL_COVER elision relies on)."""
    w_out = badf.shape[0]
    width = min(fix_k, w_out)
    width_s = min(fix_k, w_src)
    start = jnp.clip(
        jnp.argmax(badf).astype(jnp.int32), 0, max(w_out - width, 0)
    )
    cols = start + jnp.arange(width, dtype=jnp.int32)
    bad_w = badf[cols]
    lo_w = ix_lo[cols]
    hi_w = ix_hi[cols]
    # Source window anchored at the smallest bad-column lo tap.
    src0 = jnp.clip(
        jnp.min(jnp.where(bad_w, lo_w, w_src)).astype(jnp.int32),
        0,
        max(w_src - width_s, 0),
    )
    covered = bad_w & (lo_w >= src0) & (hi_w < src0 + width_s)
    return start, cols, bad_w, lo_w, hi_w, src0, covered, width, width_s


def _window_residual(badf, ix_lo, ix_hi, w_src: int, fix_k: int):
    """Bad columns the two-sided window CANNOT repair — must be empty at
    every gaze for a shape to sit in _SWEPT_FULL_COVER."""
    _, cols, _, _, _, _, covered, _, _ = _window_select(
        badf, ix_lo, ix_hi, w_src, fix_k
    )
    in_window = jnp.zeros((badf.shape[0],), bool).at[cols].set(covered)
    return badf & ~in_window


def _jump_fixup(
    out, yb, badf, ix_lo, ix_hi, nx, dx, fix_k: int, bias=0.0,
    assume_covered: bool = False,
):
    """Repair output columns whose taps escaped their tile/slab window
    (wrap-jump and edge-collapse cases).  Shared by the mm col pass and
    the fused Pallas unwarp.

    The escaped set is one contiguous run, and so are its source taps:
    dense sweeps over EVERY integer gaze at every production shape
    (1080p/4K/8K/16K) measure a worst bad-span of 127 columns — the
    single jump block, whose post-jump lo indices advance 0-or-1 per
    column (the kernels snap the center to integer pixels, so the sweep
    is exhaustive).  The repair is therefore windowed on BOTH sides:
    a fix_k-wide output window anchored at the first bad column, blended
    from a fix_k-wide dynamic_slice of the SOURCE rows — contiguous
    traffic end to end.  Neither a minor-axis scatter into the full-size
    output nor a column gather from the full-size intermediate appears
    on this path (the round-4 scatter version measured 4.3 ms of the 16K
    fused stage's 8.1, scripts/unwarp_diag2.py 2026-08-20; gathers from
    a >200 MB operand carry their own relayout cost).  Bad columns the
    window pair cannot cover (non-production fuzz geometries) fall back
    to the top_k + scatter repair via lax.cond."""
    w_out = badf.shape[0]
    w_src = yb.shape[2]
    positions = jnp.arange(w_out, dtype=jnp.int32)
    start, cols, bad_w, lo_w, hi_w, src0, covered, width, width_s = (
        _window_select(badf, ix_lo, ix_hi, w_src, fix_k)
    )
    src = jax.lax.dynamic_slice(
        yb, (0, 0, src0), (yb.shape[0], yb.shape[1], width_s)
    )
    rel_lo = jnp.clip(lo_w - src0, 0, width_s - 1)
    rel_hi = jnp.clip(hi_w - src0, 0, width_s - 1)
    # Round-5 v3: the window blend is ONE one-hot MXU dot — weights
    # (den-num) at rel_lo and num at rel_hi, both integers <= 255 so
    # bf16-exact on the MXU with exact f32 accumulation (the mm passes'
    # argument; 2-term sums < 2^24) — replacing two minor-axis column
    # gathers that measured 1.79 ms at 16K on the gather engine
    # (scripts/unwarp_diag3.py, 2026-08-21).  rel_lo == rel_hi collapses
    # both weights onto one row summing to den: exact pass-through.
    nf = nx[cols].astype(jnp.float32)
    df = dx[cols].astype(jnp.float32)
    k_iota = jnp.arange(width_s, dtype=jnp.int32)[:, None]
    wmat = jnp.where(k_iota == rel_lo[None, :], df - nf, 0.0) + jnp.where(
        k_iota == rel_hi[None, :], nf, 0.0
    )
    num = jnp.einsum(
        "chk,kl->chl",
        src.astype(jnp.float32),
        wmat,
        preferred_element_type=jnp.float32,
    )
    vals = (num / df[None, None, :] + bias).astype(jnp.uint8)

    cur = jax.lax.dynamic_slice(
        out, (0, 0, start), (out.shape[0], out.shape[1], width)
    )
    # Only bad columns whose taps the source window covers are repaired
    # here; the rest (none at any production shape) go to the fallback.
    merged = jnp.where(covered[None, None, :], vals, cur)
    windowed = jax.lax.dynamic_update_slice(out, merged, (0, 0, start))

    if assume_covered and w_out in _SWEPT_FULL_COVER:
        return windowed

    in_window = jnp.zeros((w_out,), bool).at[cols].set(covered)
    residual = badf & ~in_window

    def scatter_rest(args):
        fixed, residual = args
        scores = jnp.where(residual, positions, -1)
        fix = jax.lax.top_k(scores, width)[0]  # -1 padded
        safe = jnp.maximum(fix, 0)
        vals = _fixup_blend(yb, safe, ix_lo, ix_hi, nx, dx, bias)
        idx = jnp.where(fix < 0, w_out, fix)   # pads dropped
        return fixed.at[:, :, idx].set(vals, mode="drop")

    return jax.lax.cond(
        jnp.any(residual), scatter_rest, lambda args: args[0],
        (windowed, residual),
    )


def _mm_dot(slab, ws, scale: int, spec: str):
    """Sum of limb einsums (usually one) in exact f32 accumulation."""
    acc = jnp.einsum(spec, slab, ws[0], preferred_element_type=jnp.float32)
    if len(ws) > 1:
        acc = acc + scale * jnp.einsum(
            spec, slab, ws[1], preferred_element_type=jnp.float32
        )
    return acc


def _mm_row_pass(planar, iy_lo, iy_hi, ny, dy, maxstep: int):
    """(3, hr, Wr) u8 -> (3, Ho, Wr) u8 quantized vertical blend via
    row slabs + one MXU dot.  iy is strictly monotone (no wrap on y; steps
    {0, 1} verified over all integer gazes), so no fixup is needed."""
    _, hr, wr = planar.shape
    ho = iy_lo.shape[0]
    t, base, _bad, ws, scale, den_t = _mm_tiles(iy_lo, iy_hi, ny, dy, ho, maxstep)
    dt = _mm_dtype()
    pp = jnp.pad(planar, ((0, 0), (0, _MM_K), (0, 0)))
    slab = jax.vmap(
        lambda b: jax.lax.dynamic_slice(pp, (0, b, 0), (3, _MM_K, wr))
    )(base).astype(dt)                                 # (t, 3, K, wr)
    # Exact numerator dot, then divide by the per-pixel denominator and
    # round half-up (the fast path's 0.5 rounding).  NUM and den are
    # exact integers, NUM/den is correctly rounded, and true quotients
    # sit >= 1/den from integer boundaries, so the rounding decision
    # matches the true rational blend exactly.
    num_t = _mm_dot(slab, ws, scale, "tckw,tkl->ctlw")  # (3, t, L, wr)
    out_t = num_t / den_t[None, :, :, None] + 0.5
    return out_t.astype(jnp.uint8).reshape(3, t * _MM_L, wr)[:, :ho, :]


def _mm_col_pass(yb, ix_lo, ix_hi, nx, dx, maxstep: int):
    """(3, Ho, Wr) u8 -> (3, Ho, W) u8 horizontal blend via column slabs
    + one MXU dot, with the jump-tile top_k fixup."""
    _, ho, _wr = yb.shape
    w_out = ix_lo.shape[0]
    t, base, bad, ws, scale, den_t = _mm_tiles(ix_lo, ix_hi, nx, dx, w_out, maxstep)
    dt = _mm_dtype()
    ybp = jnp.pad(yb, ((0, 0), (0, 0), (0, _MM_K)))
    slab = jax.vmap(
        lambda b: jax.lax.dynamic_slice(ybp, (0, 0, b), (3, ho, _MM_K))
    )(base).astype(dt)                                 # (t, 3, Ho, K)
    # "chtl" output ordering makes the (3, Ho, W) reshape free.  The
    # numerator/denominator divide truncates like the exact path; exact
    # integer quotients (ratio 0 — the entire fovea) are exact in f32,
    # so no truncation bias is needed.
    num_t = _mm_dot(slab, ws, scale, "tchk,tkl->chtl")  # (3, Ho, t, L)
    out_t = num_t / den_t[None, None, :, :]
    out = out_t.reshape(3, ho, t * _MM_L)[:, :, :w_out].astype(jnp.uint8)

    # Jump-tile columns: direct gathers for the <= _MM_FIX_K overflowing
    # columns, scattered over the dot's placeholder values — the same
    # exact numerator/denominator blend the dot computes.
    badf = bad.reshape(-1)[:w_out]
    return _jump_fixup(
        out, yb, badf, ix_lo, ix_hi, nx, dx, _MM_FIX_K,
        assume_covered=True,
    )


def _axis_vectors(
    out_dim: int,
    reduced_dim: int,
    center_scaled: jax.Array,
    *,
    wrap: bool,
):
    """Per-axis 1-D quantities for the unwarp.

    Returns (idx_lo, idx_hi, ratio, num, den, maxstep): clamped
    reduced-frame indices of the two enclosing log cells (shape
    (out_dim,)), the blend factor in [0, 1], its exact integer
    numerator/denominator (ratio == num/den bitwise; den >= 1), and the
    static LUT step bound den never exceeds (drives the mm passes'
    single-dot-vs-limb choice).
    """
    lam_out = _lam(out_dim)
    cp = center_scaled  # int32 scalar: trunc(center * out_dim)
    p = jnp.arange(out_dim, dtype=jnp.int32)

    # Forward-delta LUT, precomputed in float64 at trace time so the cell
    # construction below is bit-consistent with the sampling grid (see
    # foveax.core.logrect.delta64).  |u| <= reduced_dim/2 + 1 always holds:
    # the inverse log map is bounded by ceil(reduced_dim/2) and the
    # neighbour step adds 1.
    u_off = reduced_dim // 2 + 2
    # The unwarp's forward deltas use lambda derived from the *output* dim
    # (reference: src/sat_decoder_interpolate_kernel.cl:11-12).
    lut_np = delta_table(-u_off, u_off, reduced_dim, out_dim)
    maxstep = int(np.abs(np.diff(lut_np.astype(np.int64))).max())
    lut = jnp.asarray(lut_np)

    # 360-degree wrap relative to the gaze (reference kernel :27-33).
    half = out_dim // 2
    if wrap:
        shift = jnp.where(
            p - cp > half, -out_dim, jnp.where(p - cp < -half, out_dim, 0)
        )
    else:
        shift = jnp.zeros_like(p)
    offset = shift != 0
    pw = p + shift
    d = pw - cp  # delta from center, possibly wrapped

    # Inverse log map (reference kernel :43-48).
    ad = jnp.abs(d).astype(jnp.float32)
    u_raw = jnp.ceil(
        0.5
        * np.float32(reduced_dim)
        * jnp.log(ad / lam_out + np.float32(1.0)) ** 0.25
    ).astype(jnp.int32) * jnp.sign(d)
    u = jnp.where((jnp.abs(u_raw) > jnp.abs(d)) | (u_raw == 0), d, u_raw)

    d_calc = lut[u + u_off]

    # Neighbour cell toward the center; sign taken from u, not u+du
    # (reference kernel :75-89).
    du = -jnp.sign(d)
    d_min = jnp.abs(lut[u + du + u_off]) * jnp.sign(u)

    lo = cp + jnp.minimum(d_min, d_calc)
    hi = cp + jnp.maximum(d_min, d_calc)
    u_lo = jnp.minimum(u, u + du)
    u_hi = jnp.maximum(u, u + du)

    # Edge clamping: collapse to the inner cell at frame borders; on the
    # wrap axis a wrapped pixel skips the collapse (reference kernel
    # :105-116 — the x conditions carry "&& !x_offset", the y ones do not).
    if wrap:
        u_lo2 = jnp.where((lo < 0) & ~offset, u_hi, u_lo)
        u_hi2 = jnp.where((hi >= out_dim) & ~offset, u_lo2, u_hi)
    else:
        u_lo2 = jnp.where(lo < 0, u_hi, u_lo)
        u_hi2 = jnp.where(hi >= out_dim, u_lo2, u_hi)

    # Exact integer blend fraction: num/den == the clamped ratio bitwise
    # (both correctly-rounded f32 of the same rational).  Zero-width
    # cells (hi == lo) force num = 0 — the reference blends toward the
    # lo tap there — giving 0/1.  The integer pair feeds the mm passes'
    # exact numerator dots; ratio keeps the gather paths unchanged.
    den = jnp.maximum(hi - lo, 1)
    num = jnp.where(hi == lo, 0, jnp.clip(pw - lo, 0, den))
    ratio = num.astype(jnp.float32) / den.astype(jnp.float32)

    half_r = reduced_dim // 2
    clampr = lambda v: jnp.clip(v + half_r, 0, reduced_dim - 1)
    return clampr(u_lo2), clampr(u_hi2), ratio, num, den, maxstep


def unwarp_rect(
    reduced: jax.Array,
    out_width: int,
    out_height: int,
    center: jax.Array,
    *,
    in_layout: str = "hwc",
    out_layout: str = "hwc",
    precision: str = "exact",
) -> jax.Array:
    """Unwarp a reduced uint8 frame back to (out_height, out_width).

    ``center`` is float32 (2,) in [0, 1].  Layouts: "hwc" (H, W, 3) or the
    TPU-preferred channel-planar "chw" (3, H, W).

    ``precision``:
      "exact" — four uint8 column gathers; float32 blend.  Matches the
          float64 golden to the usual interpolation tolerance.
      "fast"  — two savings compound (gathers are the dominant cost — the
          TPU gather engine runs far below streaming bandwidth, and is
          element-rate-bound, so fewer+wider gathers win):
          (1) the vertical blend is computed first and rounded to uint8,
          halving the blend inputs from four taps to two; (2) each
          lo/hi tap PAIR rides in one uint16 gather — hi is lo's
          successor except at boundary collapses, where the blend ratio
          is forced to 0, so gathering ``frame[i] | frame[i+1] << 8`` at
          the lo index yields both taps in one gather engine pass (u16
          gathers run ~1.5x the element rate of two u8 gathers).
          Output deviates from "exact" by at most 1 LSB (the rounded
          blend is within 0.5, and the horizontal blend is a convex
          combination).  Measured: 1.66/2.68/6.6 ms at 1080p/4K/8K vs
          exact's ~2.9/4.9/13 ms.
      "mm"    — no gather engine at all: the inverse map's cell index
          advances 0-or-1 per output pixel, so each 120-wide output tile
          reads a contiguous 128-wide source window (slab DMA) and the
          per-pixel tap selection + bilinear blend become one tiny MXU
          dot per axis.  The dot computes the blend's exact INTEGER
          numerator (weights den-num/num are small bf16-exact integers,
          see _mm_int_weights) and an elementwise divide by den finishes
          — one dot where the earlier bf16-limb formulation needed a
          doubled slab and two weight planes, at the same <= 1 LSB
          contract (device-validated across 32-gaze sweeps at
          1080p/4K/8K, tests/test_tpu_parity.py).  Limb-era timings
          1.70/2.47/3.83 ms at 1080p/4K/8K — 1.8x faster than "fast" at
          8K; the single-dot rewrite halves the dot FLOPs and slab bytes
          on top.
      "fused" — the mm math moved into Pallas kernels
          (foveax/kernels/unwarp_pl.py): gaze-windowed slabs DMA
          HBM->VMEM and the integer-numerator dots run kernel-resident,
          removing the mm path's materialized slab traffic.  Same
          <= 1 LSB contract; interpret-mode on the CPU backend.
          Requires production-like shapes (raises ValueError otherwise —
          fall back to "mm").
      "auto"  — accelerator backends: "fused" at >= 4K output widths
          (measured on chip — round 3: fused 1.85 vs mm 2.29 ms/frame
          at 4K; round 4: 4.95 vs 5.17 at 8K and 10.71 vs 15.12 at 16K
          — the kernel-resident slabs pay off once the materialized mm
          slab traffic dominates), "mm" below (1080p: mm 1.42 vs fused
          1.70).  The round-3 ">= 8K compile exceeded 420 s" gate was
          the tunnel wedge, falsified by the round-4 cold-cache bisect
          (unwarp:8k 2.6 s, unwarp:16k 18.4 s; persistent-cache re-runs
          0.1 s).  Ineligible shapes fall back to "mm".  CPU: "fast"
          (no MXU; dot kernels lose to the gather formulation there).
    """
    auto_fused = False
    if precision == "auto":
        if jax.default_backend() == "cpu":
            precision = "fast"
        elif out_width >= 3840:
            # Measured winners at 4K/8K/16K (docstring table); the
            # trace-time ValueError degrade below keeps unmeasured
            # intermediate widths safe on the structural contract.
            precision, auto_fused = "fused", True
        else:
            precision = "mm"
    if precision == "fused":
        from foveax.kernels.unwarp_pl import unwarp_rect_fused

        try:
            return unwarp_rect_fused(
                reduced,
                out_width,
                out_height,
                center,
                in_layout=in_layout,
                out_layout=out_layout,
                interpret=jax.default_backend() == "cpu",
            )
        except ValueError:
            # Shape outside the fused kernel's structural contract:
            # honor an explicit request loudly, degrade an auto pick.
            if not auto_fused:
                raise
            precision = "mm"
    if in_layout == "hwc":
        planar = reduced.transpose(2, 0, 1)
    else:
        planar = reduced
    _, hr, wr = planar.shape
    cx = (center[0] * jnp.float32(out_width)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(out_height)).astype(jnp.int32)

    ix_lo, ix_hi, rx, nx, dx, msx = _axis_vectors(out_width, wr, cx, wrap=True)
    iy_lo, iy_hi, ry, ny, dy, msy = _axis_vectors(out_height, hr, cy, wrap=False)

    ry2 = ry[None, :, None]
    rx2 = rx[None, None, :]

    if precision == "mm":
        yb = _mm_row_pass(planar, iy_lo, iy_hi, ny, dy, msy)
        out = _mm_col_pass(yb, ix_lo, ix_hi, nx, dx, msx)
    elif precision == "fast":
        # Pair-u16 gathers: idx_hi is always idx_lo or idx_lo + 1 (the
        # cell construction in _axis_vectors takes min/max of u and u+du
        # with |du| <= 1, and edge collapses only equalize the pair), so
        # packing frame[i] | frame[i+1] << 8 and gathering once at idx_lo
        # yields both taps per gather-engine pass.  Where the pair
        # collapsed (idx_hi == idx_lo) the blend ratio is forced to 0 and
        # the (meaningless) high byte never contributes; the duplicated
        # last row/column only feeds that dead byte.
        pr = jnp.concatenate([planar, planar[:, -1:, :]], axis=1)
        pair_r = pr[:, :-1, :].astype(jnp.uint16) | (
            pr[:, 1:, :].astype(jnp.uint16) << 8
        )
        g = jnp.take(pair_r, iy_lo, axis=1)  # (3, Ho, Wr) u16
        lo_f = (g & jnp.uint16(0xFF)).astype(jnp.float32)
        hi_f = (g >> 8).astype(jnp.float32)
        ry2 = jnp.where(iy_hi == iy_lo, jnp.float32(0), ry)[None, :, None]
        yb = (lo_f + (hi_f - lo_f) * ry2 + 0.5).astype(jnp.uint8)  # rounded

        yp = jnp.concatenate([yb, yb[:, :, -1:]], axis=2)
        pair_c = yp[:, :, :-1].astype(jnp.uint16) | (
            yp[:, :, 1:].astype(jnp.uint16) << 8
        )
        gc = jnp.take(pair_c, ix_lo, axis=2)  # (3, Ho, W) u16
        left = (gc & jnp.uint16(0xFF)).astype(jnp.float32)
        right = (gc >> 8).astype(jnp.float32)
        rx2 = jnp.where(ix_hi == ix_lo, jnp.float32(0), rx)[None, None, :]
        out = (left + (right - left) * rx2).astype(jnp.uint8)
    else:
        # Gather rows in uint8 (4x less HBM traffic than gathering f32).
        rows_lo = jnp.take(planar, iy_lo, axis=1)  # (3, Ho, Wr) u8
        rows_hi = jnp.take(planar, iy_hi, axis=1)
        tl = jnp.take(rows_lo, ix_lo, axis=2).astype(jnp.float32)
        tr = jnp.take(rows_lo, ix_hi, axis=2).astype(jnp.float32)
        bl = jnp.take(rows_hi, ix_lo, axis=2).astype(jnp.float32)
        br = jnp.take(rows_hi, ix_hi, axis=2).astype(jnp.float32)
        left = tl + (bl - tl) * ry2
        right = tr + (br - tr) * ry2
        out = (left + (right - left) * rx2).astype(jnp.uint8)

    if out_layout == "chw":
        return out
    return out.transpose(1, 2, 0)
