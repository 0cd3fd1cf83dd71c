"""NumPy float64 golden reference implementations.

These are foveax's analog of the reference's CPU twin implementations
(reference: src/sat_encoder.cc:137-185 EncodeFrameCPU,
src/sat_decoder.cc:400-532 SampleFrameRectCPU, :618-772
InterpolateFrameRectCPU, src/image_sampler.cc:302-778) — the de-facto unit
test oracles.  They are written as dense 2-D NumPy in float64, deliberately
*not* sharing the separable 1-D code path of the JAX implementations, so the
pytest comparisons exercise two independent derivations of the same math.
"""

from __future__ import annotations

import numpy as np

E_M1 = np.float64(np.e - 1.0)


def lam64(source_dim: int) -> float:
    return float(source_dim) / float(E_M1)


def delta64(u: np.ndarray, out_dim: int, source_dim: int) -> np.ndarray:
    """Signed delta in float64; truncation toward zero like the (int) cast."""
    u = np.asarray(u, dtype=np.int64)
    au = np.abs(u).astype(np.float64)
    mag_f = lam64(source_dim) * (np.exp((2.0 * au / out_dim) ** 4) - 1.0)
    mag = np.maximum(np.abs(u), np.trunc(mag_f).astype(np.int64))
    return mag * np.sign(u)


def grid_dense(out_w: int, out_h: int, src_w: int, src_h: int) -> np.ndarray:
    """(out_h+1, out_w+1, 2) int16 dense averaged grid, the reference's grid
    buffer layout (src/sat_decoder_sample_rect_kernel.cl:243-295)."""
    tx = np.arange(out_w + 1, dtype=np.int64)
    ty = np.arange(out_h + 1, dtype=np.int64)
    u = tx - 1 - out_w // 2
    v = ty - 1 - out_h // 2
    dx = delta64(u, out_w, src_w)
    dxp = delta64(u + 1, out_w, src_w)
    dy = delta64(v, out_h, src_h)
    dyp = delta64(v + 1, out_h, src_h)
    gx = np.floor((dx + dxp) / 2.0).astype(np.int16)
    gy = np.floor((dy + dyp) / 2.0).astype(np.int16)
    out = np.empty((out_h + 1, out_w + 1, 2), dtype=np.int16)
    out[..., 0] = gx[None, :]
    out[..., 1] = gy[:, None]
    return out


def build_sat(frame: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (3, H, W) uint32 inclusive SAT with mod-2^32 wrap."""
    planes = frame.astype(np.uint32).transpose(2, 0, 1)
    with np.errstate(over="ignore"):
        sat = np.cumsum(planes, axis=2, dtype=np.uint32)
        sat = np.cumsum(sat, axis=1, dtype=np.uint32)
    return sat


def sample_rect(
    sat: np.ndarray,
    grid: np.ndarray,
    center: tuple[float, float],
    *,
    wrap_x: bool = True,
) -> np.ndarray:
    """Dense-2D golden of sample_rect_kernel.  (3,Hs,Ws) u32 -> (Ho,Wo,3) u8."""
    _, hs, ws = sat.shape
    gh, gw, _ = grid.shape
    ho, wo = gh - 1, gw - 1
    cx = int(np.float32(center[0]) * np.float32(ws))
    cy = int(np.float32(center[1]) * np.float32(hs))

    g = grid.astype(np.int64)
    px = cx + g[1:, 1:, 0]  # (Ho, Wo) — delta_x at (j+1, i+1)
    pxm = cx + g[1:, :-1, 0]  # delta_x_minus at (j+1, i)
    py = cy + g[1:, 1:, 1]  # delta_y at (j+1, i+1)
    pym = cy + g[:-1, 1:, 1]  # delta_y_minus at (j, i+1)

    if wrap_x:
        hi = (px >= ws) & (pxm >= ws)
        lo = (px < 0) & (pxm < 0)
        px = px - ws * hi + ws * lo
        pxm = pxm - ws * hi + ws * lo

    valid = (((px >= 0) & (px < ws)) | ((pxm >= 0) & (pxm < ws))) & (
        ((py >= 0) & (py < hs)) | ((pym >= 0) & (pym < hs))
    )
    px = np.clip(px, 1, ws - 1)
    py = np.clip(py, 1, hs - 1)
    pxm = np.clip(pxm, 0, px - 1)
    pym = np.clip(pym, 0, py - 1)

    out = np.zeros((ho, wo, 3), dtype=np.uint8)
    rect = ((px - pxm) * (py - pym)).astype(np.uint32)
    for c in range(3):
        plane = sat[c]
        box = (
            plane[py, px]
            - plane[pym, px]
            + plane[pym, pxm]
            - plane[py, pxm]
        ).astype(np.uint32)
        out[..., c] = np.where(valid, (box // rect).astype(np.uint8), 0)
    return out


def sample_rect_360(
    sat: np.ndarray,
    grid: np.ndarray,
    center: tuple[float, float],
) -> tuple[np.ndarray, np.ndarray]:
    """Dense golden of ``sample_rect_360_kernel`` (reference:
    src/sat_decoder_sample_rect_kernel.cl:298-382) — the second sampling
    kernel, whose indexing is genuinely distinct from ``sample_rect_kernel``:
    the grid is read as FLAT short2 *pairs* at ``(j+2)*gw + (i+2)`` (high
    edge) and ``(j+2)*gw + (i-1)`` (low edge), both deltas of each edge
    coming from the same pair cell.

    Consequences transcribed faithfully:
      * the box is 3 grid cells wide in x and 1 source row tall in y
        (both edges read y-deltas from grid row j+2);
      * at i=0 / i=Wo-1 the flat index rolls into the neighboring grid
        row (deterministic — reproduced here);
      * for output rows where ``(j+2)*gw + (i+2)`` reaches past the grid
        buffer the reference reads out-of-bounds GPU memory (undefined).
        Those texels are excluded via the returned ``defined`` mask.

    Returns ``(out_u8, defined)`` where comparisons are meaningful only at
    ``defined`` texels (the kernel's own validity rule is folded in).
    """
    _, hs, ws = sat.shape
    gh, gw, _ = grid.shape
    ho, wo = gh - 1, gw - 1
    cx = int(np.float32(center[0]) * np.float32(ws))
    cy = int(np.float32(center[1]) * np.float32(hs))

    pairs = grid.reshape(-1, 2).astype(np.int64)  # flat short2 buffer
    jj, ii = np.mgrid[0:ho, 0:wo]
    flat_hi = (jj + 2) * gw + (ii + 2)
    flat_lo = (jj + 2) * gw + (ii - 1)
    defined = flat_hi < gh * gw  # flat_lo >= 2*gw-1 >= 0 always
    fh = np.clip(flat_hi, 0, gh * gw - 1)
    fl = np.clip(flat_lo, 0, gh * gw - 1)
    px = cx + pairs[fh, 0]
    py = cy + pairs[fh, 1]
    pxm = cx + pairs[fl, 0]
    pym = cy + pairs[fl, 1]

    # From here the kernel body is identical to sample_rect_kernel
    # (same wrap / validity / clamp / 4-tap, :327-381).
    hi = (px >= ws) & (pxm >= ws)
    lo = (px < 0) & (pxm < 0)
    px = px - ws * hi + ws * lo
    pxm = pxm - ws * hi + ws * lo

    valid = (((px >= 0) & (px < ws)) | ((pxm >= 0) & (pxm < ws))) & (
        ((py >= 0) & (py < hs)) | ((pym >= 0) & (pym < hs))
    )
    px = np.clip(px, 1, ws - 1)
    py = np.clip(py, 1, hs - 1)
    pxm = np.clip(pxm, 0, px - 1)
    pym = np.clip(pym, 0, py - 1)

    keep = valid & defined
    out = np.zeros((ho, wo, 3), dtype=np.uint8)
    rect = ((px - pxm) * (py - pym)).astype(np.uint32)
    for c in range(3):
        plane = sat[c]
        box = (
            plane[py, px] - plane[pym, px] + plane[pym, pxm] - plane[py, pxm]
        ).astype(np.uint32)
        out[..., c] = np.where(keep, (box // rect).astype(np.uint8), 0)
    return out, defined


def sample_box_bruteforce(
    frame: np.ndarray,
    grid: np.ndarray,
    center: tuple[float, float],
) -> np.ndarray:
    """Independent oracle: compute each box mean directly from the image with
    Python loops (no SAT, no wraparound tricks).  Small frames only."""
    hs, ws, _ = frame.shape
    gh, gw, _ = grid.shape
    ho, wo = gh - 1, gw - 1
    cx = int(np.float32(center[0]) * np.float32(ws))
    cy = int(np.float32(center[1]) * np.float32(hs))
    img = frame.astype(np.uint64)
    out = np.zeros((ho, wo, 3), dtype=np.uint8)
    for j in range(ho):
        for i in range(wo):
            px = cx + int(grid[j + 1, i + 1, 0])
            pxm = cx + int(grid[j + 1, i, 0])
            py = cy + int(grid[j + 1, i + 1, 1])
            pym = cy + int(grid[j, i + 1, 1])
            if px >= ws and pxm >= ws:
                px -= ws
                pxm -= ws
            elif px < 0 and pxm < 0:
                px += ws
                pxm += ws
            ok_x = (0 <= px < ws) or (0 <= pxm < ws)
            ok_y = (0 <= py < hs) or (0 <= pym < hs)
            if not (ok_x and ok_y):
                continue
            px = min(max(px, 1), ws - 1)
            py = min(max(py, 1), hs - 1)
            pxm = min(max(pxm, 0), px - 1)
            pym = min(max(pym, 0), py - 1)
            box = img[pym + 1 : py + 1, pxm + 1 : px + 1]
            area = (px - pxm) * (py - pym)
            out[j, i] = (box.sum(axis=(0, 1)) // area).astype(np.uint8)
    return out


def unwarp_rect(
    reduced: np.ndarray,
    out_w: int,
    out_h: int,
    center: tuple[float, float],
) -> np.ndarray:
    """Dense-2D float64 golden of interpolate_rect_kernel.

    (Hr, Wr, 3) uint8 -> (out_h, out_w, 3) uint8.
    """
    hr, wr, _ = reduced.shape
    lam_x = out_w / E_M1
    lam_y = out_h / E_M1
    cxp = int(np.float32(center[0]) * np.float32(out_w))
    cyp = int(np.float32(center[1]) * np.float32(out_h))

    x = np.arange(out_w, dtype=np.int64)
    y = np.arange(out_h, dtype=np.int64)

    def axis(p, cp, out_dim, red_dim, lam, wrap):
        if wrap:
            shift = np.where(
                p - cp > out_dim // 2,
                -out_dim,
                np.where(p - cp < -(out_dim // 2), out_dim, 0),
            )
        else:
            shift = np.zeros_like(p)
        offset = shift != 0
        pw = p + shift
        d = pw - cp
        ad = np.abs(d).astype(np.float64)
        u_raw = (
            np.ceil(0.5 * red_dim * np.log(ad / lam + 1.0) ** 0.25).astype(np.int64)
            * np.sign(d)
        )
        u = np.where((np.abs(u_raw) > np.abs(d)) | (u_raw == 0), d, u_raw)

        def fwd(uu, sgn):
            au = np.abs(uu).astype(np.float64)
            mag_f = lam * (np.exp((2.0 * au / red_dim) ** 4) - 1.0)
            mag = np.maximum(np.abs(uu), np.trunc(mag_f).astype(np.int64))
            return mag * sgn

        d_calc = fwd(u, np.sign(u))
        exact = d_calc == d
        du = -np.sign(d)
        d_min = fwd(u + du, np.sign(u))
        lo = cp + np.minimum(d_min, d_calc)
        hi = cp + np.maximum(d_min, d_calc)
        u_lo = np.minimum(u, u + du)
        u_hi = np.maximum(u, u + du)
        if wrap:
            u_lo = np.where((lo < 0) & ~offset, u_hi, u_lo)
            u_hi = np.where((hi >= out_dim) & ~offset, u_lo, u_hi)
        else:
            u_lo = np.where(lo < 0, u_hi, u_lo)
            u_hi = np.where(hi >= out_dim, u_lo, u_hi)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(
                hi == lo,
                0.0,
                np.clip((pw - lo).astype(np.float64) / (hi - lo), 0.0, 1.0),
            )
        half_r = red_dim // 2
        cl = lambda v: np.clip(v + half_r, 0, red_dim - 1)
        return exact, cl(u), cl(u_lo), cl(u_hi), ratio

    ex_x, ix_e, ix_lo, ix_hi, rx = axis(x, cxp, out_w, wr, lam_x, True)
    ex_y, iy_e, iy_lo, iy_hi, ry = axis(y, cyp, out_h, hr, lam_y, False)

    src = reduced.astype(np.float64)
    tl = src[iy_lo[:, None], ix_lo[None, :]]
    tr = src[iy_lo[:, None], ix_hi[None, :]]
    bl = src[iy_hi[:, None], ix_lo[None, :]]
    br = src[iy_hi[:, None], ix_hi[None, :]]
    ev = src[iy_e[:, None], ix_e[None, :]]

    ry2 = ry[:, None, None]
    rx2 = rx[None, :, None]
    left = tl + (bl - tl) * ry2
    right = tr + (br - tr) * ry2
    blended = left + (right - left) * rx2
    exact = (ex_y[:, None] & ex_x[None, :])[..., None]
    return np.where(exact, ev, blended).astype(np.uint8)
