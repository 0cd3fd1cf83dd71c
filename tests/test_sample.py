"""Log-rectilinear SAT sampling: JAX separable path vs dense golden vs
brute-force box means."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core import golden
from foveax.core.logrect import make_grid, make_point_grid
from foveax.core.sample import sample_rect_from_sat, sample_rect_point
from foveax.core.sat import build_sat

CENTERS = [(0.5, 0.5), (0.1, 0.2), (0.9, 0.8), (0.02, 0.5), (0.98, 0.5)]


def _grids(out_w, out_h, src_w, src_h):
    g = make_grid(out_w, out_h, src_w, src_h)
    # Use the float64 dense golden grid for BOTH paths so sampling
    # comparisons are isolated from grid transcendental tolerance.
    dense = golden.grid_dense(out_w, out_h, src_w, src_h)
    import dataclasses

    gj = dataclasses.replace(
        g,
        gx=jnp.asarray(dense[0, :, 0]),
        gy=jnp.asarray(dense[:, 0, 1]),
    )
    return gj, dense


@pytest.mark.parametrize("center", CENTERS)
def test_sample_matches_dense_golden(small_frame, center):
    src_h, src_w, _ = small_frame.shape
    out_w, out_h = 48, 32
    gj, dense = _grids(out_w, out_h, src_w, src_h)
    sat = build_sat(jnp.asarray(small_frame))
    ours = np.asarray(
        jax.jit(sample_rect_from_sat, static_argnames=("wrap_x",))(
            sat, gj, jnp.asarray(center, dtype=jnp.float32)
        )
    )
    ref = golden.sample_rect(np.asarray(sat), dense, center)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("center", [(0.5, 0.5), (0.05, 0.9)])
def test_sample_matches_bruteforce_box_means(small_frame, center):
    src_h, src_w, _ = small_frame.shape
    out_w, out_h = 24, 16
    gj, dense = _grids(out_w, out_h, src_w, src_h)
    sat = build_sat(jnp.asarray(small_frame))
    ours = np.asarray(
        sample_rect_from_sat(sat, gj, jnp.asarray(center, dtype=jnp.float32))
    )
    ref = golden.sample_box_bruteforce(small_frame, dense, center)
    np.testing.assert_array_equal(ours, ref)


def test_sample_gaze_does_not_recompile(small_frame):
    src_h, src_w, _ = small_frame.shape
    gj, _ = _grids(48, 32, src_w, src_h)
    sat = build_sat(jnp.asarray(small_frame))
    fn = jax.jit(sample_rect_from_sat, static_argnames=("wrap_x",))
    fn(sat, gj, jnp.asarray([0.5, 0.5], dtype=jnp.float32))
    n0 = fn._cache_size()
    fn(sat, gj, jnp.asarray([0.25, 0.75], dtype=jnp.float32))
    fn(sat, gj, jnp.asarray([0.99, 0.01], dtype=jnp.float32))
    assert fn._cache_size() == n0


def test_fovea_region_is_identity(small_frame):
    """At the gaze center, box size is 1 pixel: foveal samples equal source
    pixels exactly."""
    src_h, src_w, _ = small_frame.shape
    out_w, out_h = 48, 32
    gj, dense = _grids(out_w, out_h, src_w, src_h)
    sat = build_sat(jnp.asarray(small_frame))
    center = (0.5, 0.5)
    out = np.asarray(
        sample_rect_from_sat(sat, gj, jnp.asarray(center, dtype=jnp.float32))
    )
    # Central texel: delta spacing 1 -> exact pixel copy.
    j, i = out_h // 2, out_w // 2
    px = int(np.float32(0.5) * src_w) + int(dense[j + 1, i + 1, 0])
    py = int(np.float32(0.5) * src_h) + int(dense[j + 1, i + 1, 1])
    np.testing.assert_array_equal(out[j, i], small_frame[py, px])


def test_point_sample_matches_direct_indexing(small_frame):
    src_h, src_w, _ = small_frame.shape
    out_w, out_h = 48, 32
    g = make_point_grid(out_w, out_h, src_w, src_h)
    center = (0.4, 0.6)
    out = np.asarray(
        jax.jit(sample_rect_point)(
            jnp.asarray(small_frame), g, jnp.asarray(center, dtype=jnp.float32)
        )
    )
    gx = np.asarray(g.gx, dtype=np.int64)
    gy = np.asarray(g.gy, dtype=np.int64)
    cx = int(np.float32(center[0]) * src_w)
    cy = int(np.float32(center[1]) * src_h)
    for j in [0, out_h // 2, out_h - 1]:
        for i in [0, out_w // 2, out_w - 1]:
            x = cx + gx[i]
            y = cy + gy[j]
            if x >= src_w:
                x -= src_w
            elif x < 0:
                x += src_w
            if 0 <= x < src_w and 0 <= y < src_h:
                np.testing.assert_array_equal(out[j, i], small_frame[y, x])
            else:
                np.testing.assert_array_equal(out[j, i], 0)


def test_expand_sampled_scatter(small_frame):
    """Forward-scatter expansion places each reduced texel at its anchor
    (scalar-checked), leaves gaps black."""
    from foveax.core.golden import delta64
    from foveax.core.sample import expand_sampled_rect

    src_h, src_w, _ = small_frame.shape
    wr, hr = 24, 16
    reduced = small_frame[:hr, :wr]  # arbitrary content
    center = (0.5, 0.5)
    out = np.asarray(
        expand_sampled_rect(
            jnp.asarray(reduced), src_w, src_h, jnp.asarray(center, jnp.float32)
        )
    )
    assert out.shape == (src_h, src_w, 3)
    cx = int(np.float32(center[0]) * src_w)
    cy = int(np.float32(center[1]) * src_h)
    hits = 0
    # Probe near the fovea where anchors are in range and distinct (raw
    # deltas equal u there); corner texels scatter off-frame by design.
    for j in [hr // 2 - 1, hr // 2, hr // 2 + 1]:
        for i in [wr // 2 - 2, wr // 2, wr // 2 + 2]:
            dx = int(delta64(np.asarray([i - wr // 2]), wr, src_w)[0])
            dy = int(delta64(np.asarray([j - hr // 2]), hr, src_h)[0])
            x, y = cx + dx, cy + dy
            if 0 <= x < src_w and 0 <= y < src_h:
                np.testing.assert_array_equal(out[y, x], reduced[j, i])
                hits += 1
    assert hits >= 4
    # Sparse: most of the canvas stays black.
    assert (out == 0).mean() > 0.9


# --- sample_rect_360_kernel differential golden (round 2) -------------------


class TestSample360:
    """The reference's second sampling kernel has genuinely distinct
    indexing (flat short2 pairs, reference:
    src/sat_decoder_sample_rect_kernel.cl:298-382).  These tests prove the
    device port reproduces the transcribed semantics exactly — replacing
    round-1 PARITY.md's untested 'wrap_x covers both kernels' claim."""

    def setup_method(self):
        self.src_w, self.src_h = 64, 40
        self.out_w, self.out_h = 32, 20
        rng = np.random.default_rng(7)
        self.frame = rng.integers(0, 256, (self.src_h, self.src_w, 3), np.uint8)
        self.gj, self.dense = _grids(
            self.out_w, self.out_h, self.src_w, self.src_h
        )
        self.sat_np = golden.build_sat(self.frame)
        self.sat = build_sat(jnp.asarray(self.frame))

    @pytest.mark.parametrize("center", CENTERS)
    def test_device_matches_golden_exactly(self, center):
        from foveax.core.sample import sample_rect_360_from_sat

        want, defined = golden.sample_rect_360(self.sat_np, self.dense, center)
        got = np.asarray(
            jax.jit(sample_rect_360_from_sat, static_argnames="out_layout")(
                self.sat, self.gj, jnp.asarray(center, jnp.float32)
            )
        )
        np.testing.assert_array_equal(got, want)
        # The undefined band (reference reads past its grid buffer there)
        # is zeroed on both sides.
        assert not defined[-1].any()
        assert (got[~defined[..., None].repeat(3, -1)] == 0).all()

    def test_seam_wrap_actually_triggers(self):
        """The x-wraparound block must be live at seam gazes — guards the
        test from silently comparing only the interior."""
        g = self.dense.astype(np.int64)
        pairs = g.reshape(-1, 2)
        gw = self.out_w + 1
        jj, ii = np.mgrid[0 : self.out_h, 0 : self.out_w]
        fh = np.clip((jj + 2) * gw + (ii + 2), 0, pairs.shape[0] - 1)
        fl = np.clip((jj + 2) * gw + (ii - 1), 0, pairs.shape[0] - 1)
        for cx, expect_hi, expect_lo in [(0.98, True, False), (0.02, False, True)]:
            cxi = int(np.float32(cx) * np.float32(self.src_w))
            px = cxi + pairs[fh, 0]
            pxm = cxi + pairs[fl, 0]
            assert ((px >= self.src_w) & (pxm >= self.src_w)).any() == expect_hi
            assert ((px < 0) & (pxm < 0)).any() == expect_lo

    def test_360_box_differs_from_rect_kernel(self):
        """Documents that the two reference kernels are NOT pixel-equivalent
        (the 360 variant has a 3-cell x-box and 1-row y-box): if this ever
        starts passing, the port regressed into the rect kernel."""
        center = (0.5, 0.5)
        want360, defined = golden.sample_rect_360(self.sat_np, self.dense, center)
        rect = golden.sample_rect(self.sat_np, self.dense, center)
        assert (want360[defined] != rect[defined]).any()


class TestSharedTaps:
    """The shared-gather tap formulation (one (N+1)-gather per axis + bounded
    fixup) must be bit-identical to the straightforward paired gathers at
    every gaze, including the edge strips and the 360 wrap seam where the
    shared positions disagree and the fixup path is live."""

    def test_shared_equals_paired_dense_gaze_sweep(self, small_frame):
        src_h, src_w, _ = small_frame.shape
        out_w, out_h = 48, 32
        gj, _ = _grids(out_w, out_h, src_w, src_h)
        sat = build_sat(jnp.asarray(small_frame))
        fn = jax.jit(sample_rect_from_sat, static_argnames=("wrap_x", "taps"))
        # Every integer gaze position on both axes (plus the x sweep at two
        # y rows) — covers all clamp/wrap transitions.
        for cxi in range(0, src_w + 1, 1):
            for cyi in (0, src_h // 2, src_h):
                c = jnp.asarray(
                    [(cxi + 0.5) / src_w, (cyi + 0.5) / src_h], jnp.float32
                )
                a = np.asarray(fn(sat, gj, c, taps="shared"))
                b = np.asarray(fn(sat, gj, c, taps="paired"))
                np.testing.assert_array_equal(a, b, err_msg=f"cx={cxi} cy={cyi}")

    def test_shared_equals_paired_no_wrap(self, small_frame):
        src_h, src_w, _ = small_frame.shape
        gj, _ = _grids(48, 32, src_w, src_h)
        sat = build_sat(jnp.asarray(small_frame))
        fn = jax.jit(sample_rect_from_sat, static_argnames=("wrap_x", "taps"))
        for cx in (0.0, 0.013, 0.5, 0.987, 1.0):
            c = jnp.asarray([cx, 0.4], jnp.float32)
            a = np.asarray(fn(sat, gj, c, wrap_x=False, taps="shared"))
            b = np.asarray(fn(sat, gj, c, wrap_x=False, taps="paired"))
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize(
        "dims",
        [
            (1072, 608, 1920, 1080),
            (2144, 1200, 3840, 2160),
            (4272, 2400, 7680, 4320),
            (8544, 4800, 15360, 8640),
        ],
        ids=["1080p", "4k", "8k", "16k"],
    )
    def test_fixup_bound_holds_at_production_sizes(self, dims):
        """The _FIX_K capacity must cover the worst-case number of
        shared-vs-elementwise tap mismatches over ALL integer gaze
        positions (NumPy transcription of foveax.core.sample._axis_taps)."""
        from foveax.core.logrect import _grid_axis
        from foveax.core.sample import _FIX_K

        out_w, out_h, src_w, src_h = dims

        def worst(g, dim, wrap):
            g = g.astype(np.int64)
            assert np.all(np.diff(g) >= 1)  # shared taps need monotone grids
            w = 0
            for c in range(0, dim + 1):
                p = c + g
                px, pxm = p[1:], p[:-1]
                if wrap:
                    both_hi = (px >= dim) & (pxm >= dim)
                    both_lo = (px < 0) & (pxm < 0)
                    sh = np.where(both_hi, -dim, np.where(both_lo, dim, 0))
                    px, pxm = px + sh, pxm + sh
                valid = ((px >= 0) & (px < dim)) | ((pxm >= 0) & (pxm < dim))
                pc = np.clip(px, 1, dim - 1)
                pmc = np.clip(pxm, 0, pc - 1)
                if wrap:
                    psh = np.where(p >= dim, p - dim, np.where(p < 0, p + dim, p))
                else:
                    psh = p
                q = np.clip(psh, 0, dim - 1)
                w = max(w, int((valid & ((q[1:] != pc) | (q[:-1] != pmc))).sum()))
            return w

        wx = worst(np.asarray(_grid_axis(out_w, src_w)), src_w, wrap=True)
        wy = worst(np.asarray(_grid_axis(out_h, src_h)), src_h, wrap=False)
        assert wx <= _FIX_K and wy <= _FIX_K
        assert wx > 0  # the fixup path is genuinely exercised


def test_point_sample_matches_float64_golden(small_frame):
    from foveax.core import golden

    src_h, src_w, _ = small_frame.shape
    out_w, out_h = 48, 32
    g = make_point_grid(out_w, out_h, src_w, src_h)
    for center in [(0.5, 0.5), (0.25, 0.75)]:  # exact binary fractions
        out = np.asarray(
            sample_rect_point(
                jnp.asarray(small_frame), g, jnp.asarray(center, jnp.float32)
            )
        )
        ref = golden.sample_rect_point(small_frame, out_w, out_h, center)
        np.testing.assert_array_equal(out, ref)


def test_expand_matches_float64_golden(small_frame):
    from foveax.core import golden
    from foveax.core.sample import expand_sampled_rect

    src_h, src_w, _ = small_frame.shape
    hr, wr = 16, 24
    reduced = small_frame[:hr, :wr]
    for center in [(0.5, 0.5), (0.25, 0.75)]:
        out = np.asarray(
            expand_sampled_rect(
                jnp.asarray(reduced), src_w, src_h,
                jnp.asarray(center, jnp.float32),
            )
        )
        ref = golden.expand_sampled_rect(reduced, src_w, src_h, center)
        np.testing.assert_array_equal(out, ref)
