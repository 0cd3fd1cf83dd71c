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


def _axis_vectors(
    out_dim: int,
    reduced_dim: int,
    center_scaled: jax.Array,
    *,
    wrap: bool,
):
    """Per-axis 1-D quantities for the unwarp.

    Returns (idx_lo, idx_hi, ratio), each of shape (out_dim,): clamped
    reduced-frame indices of the two enclosing log cells and the blend
    factor in [0, 1].
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
    lut = jnp.asarray(delta_table(-u_off, u_off, reduced_dim, out_dim))

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

    ratio = jnp.where(
        hi == lo,
        jnp.float32(0.0),
        jnp.clip(
            (pw - lo).astype(jnp.float32) / (hi - lo).astype(jnp.float32),
            0.0,
            1.0,
        ),
    )

    half_r = reduced_dim // 2
    clampr = lambda v: jnp.clip(v + half_r, 0, reduced_dim - 1)
    return clampr(u_lo2), clampr(u_hi2), ratio


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
    """
    if in_layout == "hwc":
        planar = reduced.transpose(2, 0, 1)
    else:
        planar = reduced
    _, hr, wr = planar.shape
    cx = (center[0] * jnp.float32(out_width)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(out_height)).astype(jnp.int32)

    ix_lo, ix_hi, rx = _axis_vectors(out_width, wr, cx, wrap=True)
    iy_lo, iy_hi, ry = _axis_vectors(out_height, hr, cy, wrap=False)

    ry2 = ry[None, :, None]
    rx2 = rx[None, None, :]

    if precision == "fast":
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
