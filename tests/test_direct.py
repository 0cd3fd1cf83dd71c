"""SAT-free direct sampler: bit-equality vs the SAT path + static-band
soundness invariants.

The direct sampler's regional decomposition (crop band + windowed matmul
bands, foveax/core/direct.py) is exact only while two statically-sized
guarantees hold for every integer gaze: the crop band's positional map
disagrees with the elementwise taps on at most ``_FIX_K`` rows/columns,
and every matmul band's tap intervals land inside its static window.
Both are swept here in vectorized NumPy over ALL integer gazes at the
production grid sizes — the same methodology that pins the shared-tap
sampler's fixup bound (tests/test_sample.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core.direct import _FIX_K, _axis_bands, sample_rect_direct
from foveax.core.logrect import _grid_axis, make_grid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat

SRC_W, SRC_H, OUT_W, OUT_H = 256, 192, 144, 112

CENTERS = [
    (0.5, 0.5),
    (0.1, 0.2),
    (0.9, 0.8),
    (0.02, 0.5),
    (0.98, 0.5),
    (0.0, 0.0),
    (1.0, 1.0),
    (0.5, 0.02),
    (0.5, 0.98),
    (0.0, 1.0),
    (1.0, 0.0),
]


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (SRC_H, SRC_W, 3), np.uint8)
    grid = make_grid(OUT_W, OUT_H, SRC_W, SRC_H)
    sat = build_sat(jnp.asarray(frame))
    fr = jnp.asarray(frame.transpose(2, 0, 1))
    f_ref = jax.jit(
        lambda c, w: sample_rect_from_sat(sat, grid, c, wrap_x=w),
        static_argnums=1,
    )
    f_got = jax.jit(
        lambda c, w: sample_rect_direct(fr, grid, c, wrap_x=w),
        static_argnums=1,
    )
    return frame, grid, fr, sat, f_ref, f_got


@pytest.mark.parametrize("center", CENTERS)
@pytest.mark.parametrize("wrap", [True, False])
def test_matches_sat_path(setup, center, wrap):
    _, _, _, _, f_ref, f_got = setup
    c = jnp.asarray(center, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(f_ref(c, wrap)), np.asarray(f_got(c, wrap))
    )


def test_matches_sat_path_every_integer_x_gaze(setup):
    """Every integer cx (all seam straddle and clamp phases) at one cy."""
    _, _, _, _, f_ref, f_got = setup
    for cxi in range(SRC_W + 1):
        c = jnp.asarray((cxi / SRC_W, 0.3), jnp.float32)
        assert np.array_equal(
            np.asarray(f_ref(c, True)), np.asarray(f_got(c, True))
        ), f"cx={cxi}"


def test_matches_sat_path_every_integer_y_gaze(setup):
    _, _, _, _, f_ref, f_got = setup
    for cyi in range(SRC_H + 1):
        c = jnp.asarray((0.4, cyi / SRC_H), jnp.float32)
        assert np.array_equal(
            np.asarray(f_ref(c, True)), np.asarray(f_got(c, True))
        ), f"cy={cyi}"


def test_layouts_agree(setup):
    frame, grid, fr, _, _, _ = setup
    c = jnp.asarray((0.3, 0.6), jnp.float32)
    chw = np.asarray(sample_rect_direct(fr, grid, c, out_layout="chw"))
    hwc = np.asarray(
        sample_rect_direct(jnp.asarray(frame), grid, c, in_layout="hwc")
    )
    np.testing.assert_array_equal(chw.transpose(1, 2, 0), hwc)


def test_gaze_does_not_recompile(setup):
    _, grid, fr, _, _, _ = setup
    fn = jax.jit(lambda c: sample_rect_direct(fr, grid, c))
    fn(jnp.asarray((0.5, 0.5), jnp.float32))
    n0 = fn._cache_size()
    for c in [(0.1, 0.9), (0.77, 0.23), (0.0, 1.0)]:
        fn(jnp.asarray(c, jnp.float32))
    assert fn._cache_size() == n0


def test_fovea_region_is_identity(setup):
    frame, grid, fr, _, _, _ = setup
    c = jnp.asarray((0.5, 0.5), jnp.float32)
    red = np.asarray(sample_rect_direct(fr, grid, c))
    # Output cell (OUT_H//2 + dy, OUT_W//2 + dx) maps 1:1 near the gaze.
    cy, cx = SRC_H // 2, SRC_W // 2
    oy, ox = OUT_H // 2, OUT_W // 2
    for dy in range(-4, 4):
        for dx in range(-4, 4):
            np.testing.assert_array_equal(
                red[oy + dy, ox + dx], frame[cy + dy, cx + dx]
            )


def _sweep_axis(out_dim: int, dim: int, wrap: bool, chunk: int = 1024):
    """All-integer-gaze invariant sweep for one axis (vectorized).

    Returns (max crop-fixup count, total mm tile-window violations)
    across gazes.  Mirrors the v2 tiled geometry of foveax.core.direct:
    crop bands are positional gathers at the hi taps; mm bands tile into
    _T_L-cell slabs whose K-windows anchor on the (clipped / mod-W) tile
    base tap.
    """
    from foveax.core.direct import _T_L

    g = _grid_axis(out_dim, dim).astype(np.int64)
    bands = _axis_bands(g.tobytes(), dim)
    worst_fix = 0
    viol = 0
    for lo0 in range(0, dim + 1, chunk):
        cs = np.arange(lo0, min(lo0 + chunk, dim + 1))[:, None]
        p = cs + g[None, :]
        hi, lo = p[:, 1:], p[:, :-1]
        if wrap:
            wh = (hi >= dim) & (lo >= dim)
            wl = (hi < 0) & (lo < 0)
            sh = np.where(wh, -dim, np.where(wl, dim, 0))
            hi = hi + sh
            lo = lo + sh
        valid = ((hi >= 0) & (hi < dim)) | ((lo >= 0) & (lo < dim))
        pc = np.clip(hi, 1, dim - 1)
        pmc = np.clip(lo, 0, pc - 1)
        lo1, hi1 = pmc + 1, pc + 1
        for b in bands:
            s = slice(b.start, b.end)
            if b.kind == "crop":
                raw = cs + g[None, b.start + 1 : b.end + 1]
                expect = np.mod(raw, dim) if wrap else raw
                bad = valid[:, s] & (
                    (pc[:, s] != expect) | ((pc - pmc)[:, s] != 1)
                )
                worst_fix = max(worst_fix, int(bad.sum(axis=1).max()))
                continue
            for ts in range(b.start, b.end, _T_L):
                te = min(ts + _T_L, b.end)
                if wrap:
                    base = np.mod(lo1[:, ts], dim)
                    rl = np.mod(lo1[:, ts:te] - base[:, None], dim)
                else:
                    base = np.clip(lo1[:, ts], 0, max(dim - b.k, 0))
                    rl = lo1[:, ts:te] - base[:, None]
                rh = rl + (hi1 - lo1)[:, ts:te]
                bad = valid[:, ts:te] & ~((rl >= 0) & (rh <= b.k))
                viol += int(bad.sum())
    return worst_fix, viol


@pytest.mark.parametrize(
    "dims",
    [
        (1072, 608, 1920, 1080),
        (2144, 1200, 3840, 2160),
        (4272, 2400, 7680, 4320),
        (8544, 4800, 15360, 8640),
        (OUT_W, OUT_H, SRC_W, SRC_H),
    ],
    ids=["1080p", "4k", "8k", "16k", "testsize"],
)
def test_band_invariants_all_integer_gazes(dims):
    out_w, out_h, src_w, src_h = dims
    fx, vx = _sweep_axis(out_w, src_w, wrap=True)
    assert vx == 0, "x matmul-band window violated"
    assert fx <= _FIX_K, f"x crop fixups {fx} > {_FIX_K}"
    # wrap_x=False is public API: the x grid must also satisfy the
    # non-wrap (clip-base) geometry.
    fxn, vxn = _sweep_axis(out_w, src_w, wrap=False)
    assert vxn == 0, "x (no-wrap) matmul-band window violated"
    assert fxn <= _FIX_K, f"x (no-wrap) crop fixups {fxn} > {_FIX_K}"
    fy, vy = _sweep_axis(out_h, src_h, wrap=False)
    assert vy == 0, "y matmul-band window violated"
    assert fy <= _FIX_K, f"y crop fixups {fy} > {_FIX_K}"


def test_matches_sat_path_flagship_1080p():
    """Flagship 1920x1080 -> 1072x608: the production grid splits each
    periphery into MULTIPLE bucketed mm sub-bands (the 256-cell test size
    yields one band per side, leaving the bucket-grouped assembly
    uncovered there)."""
    rng = np.random.default_rng(11)
    src_w, src_h, out_w, out_h = 1920, 1080, 1072, 608
    frame = rng.integers(0, 256, (src_h, src_w, 3), np.uint8)
    grid = make_grid(out_w, out_h, src_w, src_h)
    from foveax.core.direct import _axis_bands

    gx = np.asarray(grid.gx, np.int64)
    n_mm = sum(
        1 for b in _axis_bands(gx.tobytes(), src_w) if b.kind == "mm"
    )
    assert n_mm >= 3, "expected bucketed sub-bands at 1080p"

    sat = build_sat(jnp.asarray(frame))
    fr = jnp.asarray(frame.transpose(2, 0, 1))
    for c in [(0.5, 0.5), (0.98, 0.03), (0.0, 1.0)]:
        cj = jnp.asarray(c, jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(sample_rect_from_sat(sat, grid, cj)),
            np.asarray(sample_rect_direct(fr, grid, cj)),
        )


def test_vmap_batch_matches_loop(setup):
    """vmap-ability: batched gazes through the direct sampler must match
    per-gaze calls (the serving tick may batch small unicast groups).
    Note the production multi-gaze path amortizes one SAT instead — this
    pins correctness, not a perf recommendation."""
    _, grid, fr, _, _, _ = setup
    centers = jnp.asarray(
        [[0.5, 0.5], [0.2, 0.3], [0.97, 0.9], [0.03, 0.5]], jnp.float32
    )
    batch = np.asarray(
        jax.jit(jax.vmap(lambda c: sample_rect_direct(fr, grid, c)))(centers)
    )
    for i in range(centers.shape[0]):
        single = np.asarray(sample_rect_direct(fr, grid, centers[i]))
        np.testing.assert_array_equal(batch[i], single)


def test_batch_api_matches_sat_batch(setup):
    """sample_rect_direct_batch (the SAT-free serve-tick batch path) is
    bit-identical to the amortized-SAT vmapped batch in both layouts.
    reference: src/video_server.cc:62-85 (per-connection stacks -> one
    batched launch)."""
    from foveax.core.direct import sample_rect_direct_batch

    frame, grid, fr, sat, _, _ = setup
    centers = jnp.asarray(
        [[0.5, 0.5], [0.02, 0.3], [0.98, 0.9], [1.0, 0.0]], jnp.float32
    )
    ref = np.asarray(
        jax.jit(jax.vmap(lambda c: sample_rect_from_sat(sat, grid, c)))(
            centers
        )
    )
    hwc = np.asarray(
        jax.jit(
            lambda cs: sample_rect_direct_batch(
                jnp.asarray(frame), grid, cs, in_layout="hwc"
            )
        )(centers)
    )
    np.testing.assert_array_equal(ref, hwc)
    chw = np.asarray(
        sample_rect_direct_batch(fr, grid, centers, out_layout="chw")
    )
    np.testing.assert_array_equal(ref.transpose(0, 3, 1, 2), chw)
