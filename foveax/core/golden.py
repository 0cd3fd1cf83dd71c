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


# ---------------------------------------------------------------------------
# Log-polar baseline goldens (reference CPU twins:
# src/image_sampler.cc:302-778; kernels
# src/image_sampler_sample_logpolar_kernel.cl,
# src/image_sampler_interpolate_kernel.cl).


def logpolar_deltas(out_w: int, out_h: int, alpha: float = 1.0) -> np.ndarray:
    """(H_out, W_out, 2) int64 truncated (dx, dy) deltas in float64:
    rho(i) = exp(10 (i/W)^alpha) * (cos, sin)(2 pi j / H)."""
    i = np.arange(out_w, dtype=np.float64)
    j = np.arange(out_h, dtype=np.float64)
    rho = np.exp(10.0 * (i / float(out_w)) ** alpha)
    ang = j / float(out_h) * 2.0 * np.pi
    dx = np.trunc(rho[None, :] * np.cos(ang)[:, None]).astype(np.int64)
    dy = np.trunc(rho[None, :] * np.sin(ang)[:, None]).astype(np.int64)
    return np.stack([dx, dy], axis=-1)


def sample_logpolar(
    frame: np.ndarray, out_w: int, out_h: int, center, alpha: float = 1.0
) -> np.ndarray:
    """Point-sampled log-polar forward map: x modulo wrap, y clamp
    (reference kernel :67-80)."""
    hs, ws, _ = frame.shape
    d = logpolar_deltas(out_w, out_h, alpha)
    x = (np.float64(center[0]) * ws + d[..., 0]).astype(np.int64)
    y = (np.float64(center[1]) * hs + d[..., 1]).astype(np.int64)
    x = np.mod(x + 10 * ws, ws)
    y = np.clip(y, 0, hs - 1)
    return frame[y, x]


def logpolar_blur(img: np.ndarray) -> np.ndarray:
    """3x3 Gaussian (0.3377 / 0.1217 / 0.0439), outer radial half only
    (columns i >= W/2), clamped borders (reference kernel :110-137)."""
    h, w, _ = img.shape
    f = img.astype(np.float64)
    p = np.pad(f, ((1, 1), (1, 1), (0, 0)), mode="edge")
    c = p[1:-1, 1:-1]
    edges = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
    corners = p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2] + p[2:, 2:]
    blurred = 0.3377 * c + 0.1217 * edges + 0.0439 * corners
    out = f.copy()
    out[:, w // 2 :] = blurred[:, w // 2 :]
    return out.astype(np.uint8)


def unwarp_logpolar(
    reduced: np.ndarray, out_w: int, out_h: int, center, alpha: float = 1.0
) -> np.ndarray:
    """Inverse log-polar in float64: radius/angle inversion, snap-exact
    check against the forward table, else bilinear in (rho, theta) with
    angular wrap (reference: src/image_sampler_interpolate_kernel.cl:28-79)."""
    hr, wr, _ = reduced.shape
    two_pi = 2.0 * np.pi
    i_h = np.arange(wr, dtype=np.float64)
    j_h = np.arange(hr, dtype=np.float64)
    rho_t = np.exp(10.0 * (i_h / float(wr)) ** alpha)
    ang_t = j_h / float(hr) * two_pi
    fwd_dx = rho_t[None, :] * np.cos(ang_t)[:, None]
    fwd_dy = rho_t[None, :] * np.sin(ang_t)[:, None]

    cxp = int(np.float64(center[0]) * out_w)
    cyp = int(np.float64(center[1]) * out_h)
    xs = np.arange(out_w)[None, :]
    ys = np.arange(out_h)[:, None] * np.ones((1, out_w), dtype=np.int64)
    half = out_w // 2
    x = np.where(
        xs - cxp > half, xs - out_w, np.where(xs - cxp < -half, xs + out_w, xs)
    )
    dx = (x - cxp).astype(np.float64)
    dy = (ys - cyp).astype(np.float64)

    r2 = dx * dx + dy * dy
    at_center = (dx == 0) & (dy == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        i_f = np.where(
            at_center,
            0.0,
            wr * (np.log(np.sqrt(r2)) / 10.0) ** (1.0 / alpha),
        )
        j_gen = (np.arctan(dy / np.where(dx == 0, 1.0, dx)) + np.pi * (dx < 0)) * (
            hr / two_pi
        )
    i_f = np.nan_to_num(i_f)
    j_gen = np.mod(j_gen + 2 * hr, hr)
    j_dx0 = (np.pi / 2 + np.pi * (dy < 0)) * (hr / two_pi)
    j_f = np.where(dx == 0, j_dx0, j_gen)
    i_idx = np.clip(np.floor(i_f + 0.5).astype(np.int64), 0, wr - 1)
    j_idx = np.clip(np.floor(j_f + 0.5).astype(np.int64), 0, hr - 1)

    calc_x = (np.float64(center[0]) * out_w + fwd_dx[j_idx, i_idx]).astype(np.int64)
    calc_y = (np.float64(center[1]) * out_h + fwd_dy[j_idx, i_idx]).astype(np.int64)
    exact = (calc_x == x) & (calc_y == ys)

    src = reduced.astype(np.float64)
    min_i = np.clip(np.floor(i_f).astype(np.int64), 0, wr - 1)
    max_i = np.clip(np.ceil(i_f).astype(np.int64), 0, wr - 1)
    min_j = np.mod(np.floor(j_f).astype(np.int64) + hr, hr)
    max_j = np.mod(np.ceil(j_f).astype(np.int64) + hr, hr)

    tl = src[min_j, min_i]
    tr = src[min_j, max_i]
    bl = src[max_j, min_i]
    br = src[max_j, max_i]
    ir = (i_f - np.floor(i_f))[..., None]
    jr = (j_f - np.floor(j_f))[..., None]
    left = tl + (bl - tl) * jr
    right = tr + (br - tr) * jr
    blended = left + (right - left) * ir
    out = np.where(exact[..., None], src[j_idx, i_idx], blended)
    return out.astype(np.uint8)


def build_pyramid_flat(frame: np.ndarray, levels: int) -> np.ndarray:
    """Flat mip buffer: level k+1 is the truncated 2x2 box mean of level k
    (layout per the reference host loop, src/image_sampler.cc:881-919)."""
    parts = [frame.reshape(-1, 3)]
    cur = frame.astype(np.uint32)
    w, h = frame.shape[1], frame.shape[0]
    for _ in range(1, levels):
        w //= 2
        h //= 2
        c = cur[: 2 * h, : 2 * w]
        cur = (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]) // 4
        parts.append(cur.astype(np.uint8).reshape(-1, 3))
    return np.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# Gnomonic viewport golden (reference: src/projections_program.cl:1-47).


def gnomonic_project(
    frame: np.ndarray, out_w: int, out_h: int, center, scale=(6.0, 3.0)
) -> np.ndarray:
    """Inverse gnomonic projection in float64; the rho == 0 center pixel
    takes the analytic limit (the reference NaNs there)."""
    hs, ws, _ = frame.shape
    i = np.arange(out_w)
    j = np.arange(out_h)
    x = np.broadcast_to(
        ((i / out_w - 0.5) * scale[0])[None, :], (out_h, out_w)
    ).astype(np.float64)
    y = np.broadcast_to(
        ((j / out_h - 0.5) * scale[1])[:, None], (out_h, out_w)
    ).astype(np.float64)
    phi1 = (center[1] - 0.5) * np.pi
    lam0 = (center[0] - 0.5) * 2 * np.pi
    rho = np.sqrt(x * x + y * y)
    c = np.arctan(rho)
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = np.arcsin(
            np.clip(
                np.cos(c) * np.sin(phi1) + y * np.sin(c) * np.cos(phi1) / rho, -1, 1
            )
        )
        lam = lam0 + np.arctan2(
            x * np.sin(c),
            rho * np.cos(phi1) * np.cos(c) - y * np.sin(phi1) * np.sin(c),
        )
    phi = np.where(rho == 0, phi1, phi)
    lam = np.where(rho == 0, lam0, lam)
    phi = np.mod(phi + np.pi / 2 + 10 * np.pi, 2 * np.pi)
    lam = np.mod(lam + np.pi + 10 * np.pi, 2 * np.pi)
    su = np.clip(lam / (2 * np.pi), 0, 0.999)
    sv = np.clip(phi / np.pi, 0, 0.999)
    sx = (su * ws).astype(np.int64)
    sy = (sv * hs).astype(np.int64)
    return frame[sy, sx]


# ---------------------------------------------------------------------------
# Point-sample baseline, forward-scatter expansion, SVD reconstruction.


def sample_rect_point(
    frame: np.ndarray, out_w: int, out_h: int, center
) -> np.ndarray:
    """Direct point sample through raw (non-averaged) log-rect deltas:
    single-sided x wrap, zero outside y bounds (reference:
    src/image_sampler_sample_rect_kernel.cl:1-46)."""
    hs, ws, _ = frame.shape
    dx = delta64(np.arange(out_w) - out_w // 2, out_w, ws)
    dy = delta64(np.arange(out_h) - out_h // 2, out_h, hs)
    cx = int(np.float64(center[0]) * ws)
    cy = int(np.float64(center[1]) * hs)
    x = cx + dx
    y = cy + dy
    x = np.where(x >= ws, x - ws, np.where(x < 0, x + ws, x))
    valid = ((x >= 0) & (x < ws))[None, :] & ((y >= 0) & (y < hs))[:, None]
    out = frame[np.clip(y, 0, hs - 1)][:, np.clip(x, 0, ws - 1)]
    return np.where(valid[..., None], out, 0).astype(np.uint8)


def expand_sampled_rect(
    reduced: np.ndarray, out_w: int, out_h: int, center
) -> np.ndarray:
    """Forward-scatter expansion: each reduced texel lands at its raw-delta
    anchor, gaps stay black (reference: src/sat_decoder.cc:555-616)."""
    hr, wr, _ = reduced.shape
    dx = delta64(np.arange(wr) - wr // 2, wr, out_w)
    dy = delta64(np.arange(hr) - hr // 2, hr, out_h)
    cx = int(np.float64(center[0]) * out_w)
    cy = int(np.float64(center[1]) * out_h)
    out = np.zeros((out_h, out_w, 3), np.uint8)
    for j, yy in enumerate(cy + dy):
        if not (0 <= yy < out_h):
            continue
        for i, xx in enumerate(cx + dx):
            if 0 <= xx < out_w:
                out[yy, xx] = reduced[j, i]
    return out


def reconstruct_sat_svd(u, s, v, residual_q, ranges) -> np.ndarray:
    """Float64 SAT reconstruction from per-channel SVD factors + 8-bit
    quantized residual: U diag(S) V + (q * range/255 - range/2)
    (reference: src/sat_decoder_sample_rect_kernel.cl:1-22,
    src/eigen_sat_generate.cc:34-52)."""
    u = np.asarray(u, dtype=np.float64)
    s = np.asarray(s, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    q = np.asarray(residual_q, dtype=np.float64)
    rng = np.asarray(ranges, dtype=np.float64)
    approx = np.einsum("chr,cr,crw->chw", u, s, v)
    resid = q.transpose(2, 0, 1) * (rng[:, None, None] / 255.0) - (
        rng[:, None, None] / 2.0
    )
    return approx + resid


def ssim64(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Float64 SSIM (Wang et al. 2004): 11x11 Gaussian window sigma 1.5,
    K1=0.01 K2=0.03, VALID region, mean over pixels and channels — the
    oracle for foveax.core.metrics.ssim (scikit-image's
    gaussian_weights=True convention)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    xs = np.arange(11, dtype=np.float64) - 5.0
    g = np.exp(-(xs * xs) / (2.0 * 1.5 * 1.5))
    g /= g.sum()
    win = np.outer(g, g)
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2

    def filt(img):
        h, w = img.shape[:2]
        out = np.zeros((h - 10, w - 10, img.shape[2]), np.float64)
        for j in range(h - 10):
            for i in range(w - 10):
                patch = img[j : j + 11, i : i + 11]
                out[j, i] = np.tensordot(win, patch, axes=([0, 1], [0, 1]))
        return out

    mu_a, mu_b = filt(a), filt(b)
    va = filt(a * a) - mu_a * mu_a
    vb = filt(b * b) - mu_b * mu_b
    cov = filt(a * b) - mu_a * mu_b
    m = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(m.mean())
