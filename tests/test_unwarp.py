"""Inverse unwarp: JAX separable path vs dense float64 golden, plus
fovea-identity round-trip properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core import golden
from foveax.core.logrect import make_grid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat
from foveax.core.unwarp import unwarp_rect

CENTERS = [(0.5, 0.5), (0.15, 0.3), (0.92, 0.7)]


@pytest.mark.parametrize("center", CENTERS)
def test_unwarp_matches_golden(rng, center):
    hr, wr = 16, 24
    out_w, out_h = 96, 64
    reduced = rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8)
    ours = np.asarray(
        jax.jit(unwarp_rect, static_argnames=("out_width", "out_height"))(
            jnp.asarray(reduced),
            out_w,
            out_h,
            jnp.asarray(center, dtype=jnp.float32),
        )
    )
    ref = golden.unwarp_rect(reduced, out_w, out_h, center)
    # float32 vs float64: snap decisions and ratios may differ at a handful
    # of cell boundaries; blended values within 1 LSB elsewhere.
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    assert (diff <= 1).mean() > 0.995, f"large diffs: {(diff > 1).sum()}"
    assert np.median(diff) == 0


@pytest.mark.parametrize("center", CENTERS)
def test_foveate_unwarp_roundtrip_fovea_exact(small_frame, center):
    """Pixels at the gaze center survive foveate->unwarp exactly (spacing-1
    region both ways); peripheral pixels are low-error."""
    src_h, src_w, _ = small_frame.shape
    out_w, out_h = 48, 32
    g = make_grid(out_w, out_h, src_w, src_h)
    sat = build_sat(jnp.asarray(small_frame))
    c = jnp.asarray(center, dtype=jnp.float32)
    reduced = sample_rect_from_sat(sat, g, c)
    restored = np.asarray(unwarp_rect(reduced, src_w, src_h, c))

    cx = int(np.float32(center[0]) * src_w)
    cy = int(np.float32(center[1]) * src_h)
    r = 3
    ys = slice(max(cy - r, 0), min(cy + r, src_h))
    xs = slice(max(cx - r, 0), min(cx + r, src_w))
    np.testing.assert_array_equal(restored[ys, xs], small_frame[ys, xs])

    err = np.abs(
        restored.astype(np.int32) - small_frame.astype(np.int32)
    ).mean()
    assert err < 16.0, f"mean abs error too high: {err}"


def test_unwarp_no_recompile_on_gaze(rng):
    reduced = jnp.asarray(
        rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    )
    fn = jax.jit(unwarp_rect, static_argnames=("out_width", "out_height"))
    fn(reduced, 96, 64, jnp.asarray([0.5, 0.5], dtype=jnp.float32))
    n0 = fn._cache_size()
    fn(reduced, 96, 64, jnp.asarray([0.1, 0.9], dtype=jnp.float32))
    assert fn._cache_size() == n0


def test_unwarp_wraps_horizontally(rng):
    """A gaze at the left edge pulls fovea-resolution content across the
    x seam — outputs near x=W-1 should draw from the fovea region."""
    hr, wr = 16, 24
    out_w, out_h = 96, 64
    reduced = rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8)
    c = jnp.asarray([0.01, 0.5], dtype=jnp.float32)
    out = np.asarray(unwarp_rect(jnp.asarray(reduced), out_w, out_h, c))
    ref = golden.unwarp_rect(reduced, out_w, out_h, (0.01, 0.5))
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert (diff <= 1).mean() > 0.99


def test_fast_precision_within_one_lsb(rng):
    """precision="fast" (quantized vertical blend + pair-u16 gathers: each
    lo/hi tap pair packed as one uint16 and gathered once per axis) must
    stay within 1 LSB of the exact gather path everywhere."""
    import jax

    hr, wr = 16, 24
    out_w, out_h = 96, 64
    reduced = jnp.asarray(rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8))
    for center in [(0.5, 0.5), (0.1, 0.8)]:
        c = jnp.asarray(center, dtype=jnp.float32)
        exact = np.asarray(unwarp_rect(reduced, out_w, out_h, c))
        fast = np.asarray(
            unwarp_rect(reduced, out_w, out_h, c, precision="fast")
        )
        d = np.abs(exact.astype(np.int32) - fast.astype(np.int32))
        assert d.max() <= 1, d.max()


@pytest.mark.parametrize("center", [(0.5, 0.5), (0.15, 0.3)])
def test_fast_precision_vs_float64_golden(rng, center):
    """The fast path must also stay within the project's 1-LSB envelope of
    the float64 golden (not just of the exact JAX path)."""
    hr, wr = 16, 24
    out_w, out_h = 96, 64
    reduced = rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8)
    fast = np.asarray(
        unwarp_rect(
            jnp.asarray(reduced),
            out_w,
            out_h,
            jnp.asarray(center, dtype=jnp.float32),
            precision="fast",
        )
    )
    ref = golden.unwarp_rect(reduced, out_w, out_h, center)
    d = np.abs(fast.astype(np.int32) - ref.astype(np.int32))
    assert (d <= 2).all()  # 1 LSB quantization + 1 LSB golden tolerance
    assert (d <= 1).mean() > 0.99


@pytest.mark.parametrize("center", [(0.5, 0.5), (0.02, 0.3), (0.97, 0.9)])
def test_mm_precision_within_one_lsb(rng, center):
    """precision="mm" (slab + MXU-dot unwarp) must stay within 1 LSB of
    the exact path, including at wrap-seam gazes where the bounded
    jump-tile fixup engages.  (On CPU the dots run in f32; the bf16-limb
    device numerics are covered by the tpu-parity lane.)"""
    hr, wr = 32, 48
    out_w, out_h = 96, 64
    reduced = jnp.asarray(rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8))
    c = jnp.asarray(center, dtype=jnp.float32)
    exact = np.asarray(unwarp_rect(reduced, out_w, out_h, c))
    mm = np.asarray(unwarp_rect(reduced, out_w, out_h, c, precision="mm"))
    d = np.abs(exact.astype(np.int32) - mm.astype(np.int32))
    assert d.max() <= 1, d.max()


def test_mm_dense_gaze_sweep_vs_fast(rng):
    """Every horizontal gaze position (all jump placements relative to
    the 120-column tiles) stays within 1 LSB of the fast path."""
    hr, wr = 16, 32
    out_w, out_h = 64, 32
    reduced = jnp.asarray(rng.integers(0, 256, size=(3, hr, wr), dtype=np.uint8))
    import jax

    f = jax.jit(
        lambda c: (
            unwarp_rect(reduced, out_w, out_h, c, in_layout="chw",
                        out_layout="chw", precision="fast").astype(jnp.int32)
            - unwarp_rect(reduced, out_w, out_h, c, in_layout="chw",
                          out_layout="chw", precision="mm").astype(jnp.int32)
        )
    )
    for cx in range(0, out_w, 1):
        d = np.abs(np.asarray(f(jnp.asarray([cx / out_w, 0.4], jnp.float32))))
        assert d.max() <= 1, (cx, d.max())


def test_mm_fovea_identity(rng):
    """The fovea must stay bit-exact through the mm path (blend ratio 0,
    one-hot weights: the epsilon keeps exact integers from truncating
    down)."""
    hr, wr = 32, 48
    out_w, out_h = 96, 64
    reduced = rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8)
    out = np.asarray(
        unwarp_rect(
            jnp.asarray(reduced), out_w, out_h,
            jnp.asarray([0.5, 0.5], jnp.float32), precision="mm",
        )
    )
    k = 6
    cx, cy = out_w // 2, out_h // 2
    np.testing.assert_array_equal(
        out[cy - k : cy + k + 1, cx - k : cx + k + 1],
        reduced[hr // 2 - k : hr // 2 + k + 1, wr // 2 - k : wr // 2 + k + 1],
    )


def test_mm_limb_fallback_within_one_lsb(rng, monkeypatch):
    """Non-production grids whose delta-LUT steps exceed 255 take the
    two-limb integer weight branch (weights no longer bf16-exact in one
    plane).  Force the bf16 dtype on CPU so the branch actually runs and
    pin it to the same <= 1 LSB contract.  (96-wide output over a
    16-wide reduced frame has max step ~365, asserted below so the test
    keeps testing the branch if grid math changes.)"""
    from foveax.core import unwarp as U

    hr, wr = 16, 16
    out_w, out_h = 96, 96
    ms = U._axis_vectors(out_w, wr, jnp.int32(48), wrap=True)[5]
    assert ms > 255, "grid no longer exercises the limb branch"
    monkeypatch.setattr(U, "_mm_dtype", lambda: jnp.bfloat16)
    reduced = jnp.asarray(rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8))
    for center in [(0.5, 0.5), (0.05, 0.8)]:
        c = jnp.asarray(center, dtype=jnp.float32)
        exact = np.asarray(unwarp_rect(reduced, out_w, out_h, c))
        mm = np.asarray(unwarp_rect(reduced, out_w, out_h, c, precision="mm"))
        d = np.abs(exact.astype(np.int32) - mm.astype(np.int32))
        assert d.max() <= 1, d.max()


def test_mm_tile_window_precondition():
    """The mm path's slab-window correctness rests on a structural property
    of the inverse map: per 120-column output tile, ix_lo spans at most
    126 source cells except in the single tile containing the circular
    wrap jump (whose overflow columns the top_k fixup repairs, capacity
    _MM_FIX_K).  If grid-math changes ever break this, the fixup would
    silently drop columns — pin it across ALL integer gazes at two sizes
    and sampled gazes at 1080p."""
    from foveax.core.unwarp import _MM_FIX_K, _MM_K, _MM_L, _axis_vectors
    from foveax.config import reduced_dim

    def check(out_dim, red_dim, gazes):
        f = jax.jit(
            lambda cp: _axis_vectors(out_dim, red_dim, cp, wrap=True)
        )
        t = -(-out_dim // _MM_L)
        for cp in gazes:
            lo = np.asarray(f(jnp.int32(cp))[0]).astype(np.int64)
            lo_p = np.concatenate([lo, np.full(t * _MM_L - out_dim, lo[-1])])
            tiles = lo_p.reshape(t, _MM_L)
            over = tiles - tiles.min(axis=1, keepdims=True) > (_MM_K - 2)
            # Overflow confined to at most one tile, within fixup capacity.
            bad_tiles = over.any(axis=1).sum()
            assert bad_tiles <= 1, (out_dim, cp, bad_tiles)
            n_bad = int(over.sum())
            assert n_bad <= min(_MM_FIX_K, out_dim), (out_dim, cp, n_bad)

    check(96, reduced_dim(96), range(96))
    check(320, reduced_dim(320), range(320))
    check(1920, reduced_dim(1920), range(0, 1920, 37))


def test_jump_fixup_windowed_and_fallback_paths():
    """_jump_fixup repairs (a) a contiguous bad run via the two-sided
    window path and (b) bad columns the window pair cannot cover via the
    scatter fallback — both bit-exact against a NumPy blend."""
    import jax.numpy as jnp

    from foveax.core.unwarp import _jump_fixup

    rng = np.random.default_rng(5)
    H, W_SRC, W_OUT, FIX_K = 8, 64, 80, 16
    yb = rng.integers(0, 256, (3, H, W_SRC), np.uint8)
    ix_lo = rng.integers(0, W_SRC - 1, W_OUT).astype(np.int32)
    ix_hi = np.minimum(ix_lo + rng.integers(0, 2, W_OUT), W_SRC - 1).astype(
        np.int32
    )
    dx = rng.integers(1, 24, W_OUT).astype(np.int32)
    nx = (rng.integers(0, 100, W_OUT) % dx).astype(np.int32)

    # Run A: one contiguous bad run with contiguous source taps (the
    # production shape) -> pure window path.
    badf = np.zeros(W_OUT, bool)
    badf[20:29] = True
    ix_lo_a = ix_lo.copy()
    ix_lo_a[20:29] = np.arange(40, 49)  # monotone source run
    ix_hi_a = ix_lo_a + (ix_hi - ix_lo)
    ix_hi_a = np.minimum(ix_hi_a, W_SRC - 1).astype(np.int32)

    # Run B: two far-apart bad runs -> window + scatter fallback.
    badf_b = badf.copy()
    badf_b[70:73] = True

    for bad in (badf, badf_b):
        out = rng.integers(0, 256, (3, H, W_OUT), np.uint8)
        got = np.asarray(
            _jump_fixup(
                jnp.asarray(out), jnp.asarray(yb), jnp.asarray(bad),
                jnp.asarray(ix_lo_a), jnp.asarray(ix_hi_a),
                jnp.asarray(nx), jnp.asarray(dx), FIX_K,
            )
        )
        want = out.copy()
        for j in np.flatnonzero(bad):
            left = yb[:, :, ix_lo_a[j]].astype(np.float64)
            right = yb[:, :, ix_hi_a[j]].astype(np.float64)
            want[:, :, j] = (
                (left * (dx[j] - nx[j]) + right * nx[j]) / dx[j]
            ).astype(np.uint8)
        np.testing.assert_array_equal(got, want)


def test_swept_shapes_window_covers_every_gaze():
    """Backs the _SWEPT_FULL_COVER static elision of the scatter
    fallback: at every production output width, for a dense sweep of
    integer gaze positions (exhaustive at 1080p, strided >=8x elsewhere
    — the jump geometry shifts with the gaze cell index, so strides
    cover every distinct local configuration), the two-sided window
    repairs EVERY escaped column for BOTH fixup clients (the fused yx
    x pass and the mm col pass).  Uses the same _window_select math the
    fixup executes (single source of truth)."""
    import jax

    from foveax.config import reduced_dim
    from foveax.core.unwarp import (
        _axis_vectors,
        _mm_tiles,
        _window_residual,
    )
    from foveax.kernels.unwarp_pl import _FIX_K, _QX, _block_geom, _x_geom
    from foveax.core.unwarp import _MM_FIX_K

    shapes = [
        (1920, 1080, 1),    # exhaustive
        (3840, 2160, 5),
        (7680, 4320, 11),
        (15360, 8640, 23),
    ]
    for out_w, out_h, stride in shapes:
        rw = reduced_dim(out_w)
        lx, kx, _hb = _x_geom(out_w, out_h, rw)
        assert lx, (out_w, out_h)
        wp = -(-(rw + kx) // 128) * 128
        fused_fix = max(_FIX_K, 2 * lx)

        # The xy order picks its own (lx, kx) against the reduced
        # height and repairs from the reduced frame (w_src = rw, not
        # the padded wp); its coverage is swept here too so the xy call
        # site can elide the scatter fallback as well.
        from foveax.config import reduced_dim as _rd_
        from foveax.kernels.unwarp_pl import _hb, _x_candidates

        hr = _rd_(out_h)
        lx_xy = kx_xy = 0
        for lxc, kxc in _x_candidates() + ((128, 384),):
            if out_w % lxc or rw < kxc:
                continue
            if _hb(hr, kxc, lxc):
                lx_xy, kx_xy = lxc, kxc
                break
        assert lx_xy, (out_w, out_h)
        xy_fix = max(_FIX_K, 2 * lx_xy)

        def any_residual(cx, out_w=out_w, rw=rw, lx=lx, kx=kx, wp=wp,
                         fused_fix=fused_fix, lx_xy=lx_xy, kx_xy=kx_xy,
                         xy_fix=xy_fix):
            ix_lo, ix_hi, _r, nx, dx, ms = _axis_vectors(
                out_w, rw, cx, wrap=True
            )
            _bx, _rl, _rs, _rn, _rd, badf = _block_geom(
                ix_lo, ix_hi, nx, dx, lx, rw, kx, _QX, wrap=True
            )
            fused_bad = _window_residual(
                badf, ix_lo, ix_hi, wp, fused_fix
            ).any()
            _bx2, _rl2, _rs2, _rn2, _rd2, badf_xy = _block_geom(
                ix_lo, ix_hi, nx, dx, lx_xy, rw, kx_xy, _QX, wrap=True
            )
            xy_bad = _window_residual(
                badf_xy, ix_lo, ix_hi, rw, xy_fix
            ).any()
            _t, _b, bad_mm, _w, _s, _d = _mm_tiles(
                ix_lo, ix_hi, nx, dx, out_w, int(ms)
            )
            badf_mm = bad_mm.reshape(-1)[:out_w]
            mm_bad = _window_residual(
                badf_mm, ix_lo, ix_hi, rw, _MM_FIX_K
            ).any()
            return fused_bad | xy_bad | mm_bad

        centers = jnp.arange(0, out_w + 1, stride, dtype=jnp.int32)
        got = jax.jit(jax.vmap(any_residual))(centers)
        assert not bool(np.asarray(got).any()), out_w
