"""SVD-compressed summed-area tables.

The experimental bandwidth-reduction path of the reference: a SAT is
factored per channel as U diag(S) V (rank ~30) plus an 8-bit quantized
residual; the server can then reconstruct SAT values on demand instead of
storing the full uint32 table (reference:
src/sat_decoder_sample_rect_kernel.cl:1-136 device side,
src/sat_decoder.cc:774-885 host side, src/eigen_sat_generate.cc CPU
benchmark).

TPU-native design: reconstruction at the gaze-aligned grid positions is a
pair of *matmuls* per channel — gather U rows at the grid's y-positions,
gather V columns at the x-positions, then (H_out+1, r) @ (r, W_out+1) on
the MXU — instead of the reference's per-texel rank-r dot-product loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from foveax.core.logrect import LogRectGrid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SVDSat:
    """Per-channel rank-r factorization + quantized residual of a SAT.

    u: (3, H, r) float32;  s: (3, r) float32;  v: (3, r, W) float32;
    residual_q: (H, W, 3) uint8;  ranges: (3,) float32 — residual span per
    channel (value = q * range/255 - range/2).
    """

    u: jax.Array
    s: jax.Array
    v: jax.Array
    residual_q: jax.Array
    ranges: jax.Array


def compress_sat(sat: jax.Array, rank: int) -> SVDSat:
    """Factor a (3, H, W) uint32 SAT into rank-`rank` SVD + 8-bit residual.

    Offline path (host NumPy SVD in float64 for stability).
    """
    sat_np = np.asarray(sat).astype(np.float64)
    us, ss, vs, res_q, ranges = [], [], [], [], []
    for c in range(3):
        u, s, vt = np.linalg.svd(sat_np[c], full_matrices=False)
        u, s, vt = u[:, :rank], s[:rank], vt[:rank]
        approx = (u * s) @ vt
        resid = sat_np[c] - approx
        rng = 2.0 * max(np.abs(resid).max(), 1e-6)
        q = np.clip((resid + rng / 2.0) * (255.0 / rng), 0, 255).astype(np.uint8)
        us.append(u.astype(np.float32))
        ss.append(s.astype(np.float32))
        vs.append(vt.astype(np.float32))
        res_q.append(q)
        ranges.append(rng)
    return SVDSat(
        u=jnp.asarray(np.stack(us)),
        s=jnp.asarray(np.stack(ss)),
        v=jnp.asarray(np.stack(vs)),
        residual_q=jnp.asarray(np.stack(res_q, axis=-1)),
        ranges=jnp.asarray(np.asarray(ranges, dtype=np.float32)),
    )


def reconstruct_sat(svd: SVDSat) -> jax.Array:
    """Full (3, H, W) float32 SAT reconstruction (the eigen_sat_generate
    path, reference: src/eigen_sat_generate.cc:34-52) — one batched matmul."""
    # HIGHEST: SAT magnitudes reach 255*W*H (~1e8 at 1080p); the MXU's
    # default bf16 operand truncation (8 mantissa bits) would inject
    # ~4e-3 relative error — ~4e5 absolute — destroying the 4-tap box
    # differences sampling takes.  HIGHEST runs the multi-pass f32-
    # equivalent matmul; CPU backends are unaffected.
    approx = jnp.einsum(
        "chr,cr,crw->chw",
        svd.u,
        svd.s,
        svd.v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    resid = (
        svd.residual_q.astype(jnp.float32).transpose(2, 0, 1)
        * (svd.ranges / 255.0)[:, None, None]
        - (svd.ranges / 2.0)[:, None, None]
    )
    return jnp.maximum(approx + resid, 0.0)


def create_reduced_sat(
    svd: SVDSat,
    grid: LogRectGrid,
    center: jax.Array,
) -> jax.Array:
    """Gaze-aligned reduced SAT: (H_out+1, W_out+1, 5) float32 texels of
    (r, g, b, src_x, src_y).

    Mirrors create_reduced_sat_kernel (reference:
    src/sat_decoder_sample_rect_kernel.cl:79-136): per grid node, validity
    requires this-or-previous node in frame per axis; positions clamp into
    the frame.  foveax fills the full (H_out+1) x (W_out+1) node lattice
    (the reference's launch guard leaves its last row/column unwritten).
    The rank-r reconstruction at all nodes is two MXU matmuls per channel.
    """
    _, hs = svd.u.shape[0], svd.u.shape[1]
    ws = svd.v.shape[2]
    gx = grid.gx.astype(jnp.int32)  # (Wo+1,)
    gy = grid.gy.astype(jnp.int32)  # (Ho+1,)
    cx = (center[0] * jnp.float32(ws)).astype(jnp.int32)
    cy = (center[1] * jnp.float32(hs)).astype(jnp.int32)

    px = cx + gx
    py = cy + gy
    pxm = jnp.concatenate([px[:1], px[:-1]])  # previous node (clamped at 0)
    pym = jnp.concatenate([py[:1], py[:-1]])
    valid_x = ((px >= 0) & (px < ws)) | ((pxm >= 0) & (pxm < ws))
    valid_y = ((py >= 0) & (py < hs)) | ((pym >= 0) & (pym < hs))
    xc = jnp.clip(px, 0, ws - 1)
    yc = jnp.clip(py, 0, hs - 1)

    # Rank-r reconstruction at the node lattice: gather rows of U and
    # columns of V, then contract on the MXU.
    u_rows = jnp.take(svd.u, yc, axis=1)  # (3, Ho+1, r)
    v_cols = jnp.take(svd.v, xc, axis=2)  # (3, r, Wo+1)
    approx = jnp.einsum(
        "cyr,cr,crx->cyx",
        u_rows,
        svd.s,
        v_cols,
        preferred_element_type=jnp.float32,
        # HIGHEST for the same reason as reconstruct_sat: bf16-truncated
        # operands at SAT magnitude would swamp the box differences.
        precision=jax.lax.Precision.HIGHEST,
    )
    res_rows = jnp.take(svd.residual_q, yc, axis=0)
    res = jnp.take(res_rows, xc, axis=1).astype(jnp.float32)  # (Ho+1, Wo+1, 3)
    res = res.transpose(2, 0, 1) * (svd.ranges / 255.0)[:, None, None] - (
        svd.ranges / 2.0
    )[:, None, None]
    rgb = jnp.maximum(approx + res, 0.0).transpose(1, 2, 0)

    valid = (valid_y[:, None] & valid_x[None, :])[..., None]
    rgb = jnp.where(valid, rgb, 0.0)
    pos = jnp.stack(
        [
            jnp.broadcast_to(xc[None, :], rgb.shape[:2]).astype(jnp.float32),
            jnp.broadcast_to(yc[:, None], rgb.shape[:2]).astype(jnp.float32),
        ],
        axis=-1,
    )
    pos = jnp.where(valid, pos, 0.0)
    return jnp.concatenate([rgb, pos], axis=-1)


def sample_from_reduced_sat(reduced_sat: jax.Array) -> jax.Array:
    """Box-filter from a reduced SAT: (Ho+1, Wo+1, 5) -> (Ho, Wo, 3) uint8.

    Mirrors sample_rect_from_reduced_sat_kernel (reference:
    src/sat_decoder_sample_rect_kernel.cl:25-76) including its corner
    masking by rect_x/rect_y positivity and the max(rect, 1) divisor.
    """
    tl = reduced_sat[:-1, :-1]
    tr = reduced_sat[:-1, 1:]
    bl = reduced_sat[1:, :-1]
    br = reduced_sat[1:, 1:]

    rect_x = (br[..., 3] - bl[..., 3]).astype(jnp.int32)
    rect_y = (br[..., 4] - tr[..., 4]).astype(jnp.int32)
    mx = (rect_x > 0).astype(jnp.float32)[..., None]
    my = (rect_y > 0).astype(jnp.float32)[..., None]
    mxy = ((rect_x > 0) & (rect_y > 0)).astype(jnp.float32)[..., None]
    mor = ((rect_x > 0) | (rect_y > 0)).astype(jnp.float32)[..., None]

    size = (jnp.maximum(rect_x, 1) * jnp.maximum(rect_y, 1)).astype(jnp.float32)
    val = (
        br[..., :3] * mor - tr[..., :3] * my + tl[..., :3] * mx - bl[..., :3] * mxy
    ) / size[..., None]
    return jnp.clip(val, 0.0, 255.0).astype(jnp.uint8)
