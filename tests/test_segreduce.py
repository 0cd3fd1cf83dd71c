"""Fused Pallas segment-reduce sampler: interpret-mode bit-equality vs
the SAT path + static window invariants at production sizes.

The kernels' correctness rests on the same statically-sized guarantee as
the direct sampler: every cell's (exact, elementwise clamped/wrapped)
tap interval must land inside its block's quantized, clipped slab
window.  The sweep below checks that over ALL integer gazes per axis at
the production grids for the kernel geometry (_S=32/q=8 rows,
_SX=128/q=128 columns, both wrap modes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core.logrect import _grid_axis, make_grid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat
from foveax.kernels import segreduce
from foveax.kernels.segreduce import (
    _SX,
    _S,
    _block_geometry,
    sample_rect_fused,
)

SRC_W, SRC_H, OUT_W, OUT_H = 1920, 512, 1072, 288

CENTERS = [
    (0.5, 0.5),
    (0.03, 0.4),
    (0.97, 0.6),
    (0.0, 0.0),
    (1.0, 1.0),
    (0.31, 0.87),
    (0.999, 0.001),
    (0.0, 1.0),
]


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (SRC_H, SRC_W, 3), np.uint8)
    grid = make_grid(OUT_W, OUT_H, SRC_W, SRC_H)
    sat = build_sat(jnp.asarray(frame))
    fr = jnp.asarray(frame.transpose(2, 0, 1))
    return grid, sat, fr


@pytest.mark.parametrize("wrap", [True, False])
@pytest.mark.parametrize("center", CENTERS)
def test_fused_matches_sat_path(setup, center, wrap):
    grid, sat, fr = setup
    c = jnp.asarray(center, jnp.float32)
    ref = np.asarray(sample_rect_from_sat(sat, grid, c, wrap_x=wrap))
    got = np.asarray(
        sample_rect_fused(fr, grid, c, wrap_x=wrap, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_fused_chw_layout(setup):
    grid, sat, fr = setup
    c = jnp.asarray((0.4, 0.7), jnp.float32)
    hwc = np.asarray(sample_rect_fused(fr, grid, c, interpret=True))
    chw = np.asarray(
        sample_rect_fused(fr, grid, c, out_layout="chw", interpret=True)
    )
    np.testing.assert_array_equal(hwc, chw.transpose(1, 2, 0))


def _sweep_axis(out_dim, dim, wrap, s_cells, quantum, chunk=1024):
    """Max window violations over all integer gazes for one axis.

    Mirrors the kernel geometry exactly — the ADAPTIVE band split with
    per-band block widths — including the y pass's alignment padding:
    bands and the non-wrap base clip use the quantum-aligned padded dim
    (the kernels pad the source rows), while the tap clamps stay at the
    true dim."""
    from foveax.kernels.segreduce import (
        _MINOR_CAP_X,
        _MINOR_CAP_Y,
        _adaptive_bands,
    )

    g = _grid_axis(out_dim, dim).astype(np.int64)
    dim_pad = -(-dim // quantum) * quantum if not wrap else dim
    minor_cap, eb = (
        (_MINOR_CAP_X, 2) if s_cells == _SX else (_MINOR_CAP_Y, 1)
    )
    bands = _adaptive_bands(g.tobytes(), dim_pad, s_cells, quantum,
                            minor_cap, eb)
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
        for b, s_band in bands:
            for bs in range(b.start, b.end, s_band):
                be = min(bs + s_band, b.end)
                if wrap and b.k >= dim:
                    # Whole-period window anchors at 0 (see _block_geometry).
                    base = np.zeros(lo1.shape[0], dtype=np.int64)
                    rl = np.mod(lo1[:, bs:be], dim)
                elif wrap:
                    base = (np.mod(lo1[:, bs], dim) // quantum) * quantum
                    rl = np.mod(lo1[:, bs:be] - base[:, None], dim)
                else:
                    base = np.clip(lo1[:, bs], 0, max(dim_pad - b.k, 0))
                    base = (base // quantum) * quantum
                    rl = lo1[:, bs:be] - base[:, None]
                rh = rl + (hi1 - lo1)[:, bs:be]
                bad = valid[:, bs:be] & ~((rl >= 0) & (rh <= b.k))
                viol += int(bad.sum())
                if not wrap:
                    # DMA bound: window must stay inside the (padded) source.
                    viol += int((base + b.k > dim_pad).sum())
    return viol


@pytest.mark.parametrize(
    "dims",
    [
        (1072, 608, 1920, 1080),
        (2144, 1200, 3840, 2160),
        (4272, 2400, 7680, 4320),
        (8544, 4800, 15360, 8640),
        (OUT_W, OUT_H, SRC_W, SRC_H),
        # Quantum-UNaligned heights: the y clip bound is only 8-aligned
        # after the kernel's row padding — the regression class the
        # differential fuzz caught (bottom-clamped cells escaping their
        # quantized window at any src_h % 8 != 0).
        (576, 128, 1024, 204),
        (288, 304, 512, 539),
        (432, 176, 768, 307),
    ],
    ids=["1080p", "4k", "8k", "16k", "testsize", "h204", "h539", "h307"],
)
def test_kernel_window_invariants_all_integer_gazes(dims):
    out_w, out_h, src_w, src_h = dims
    assert _sweep_axis(out_h, src_h, False, _S, 8) == 0
    assert _sweep_axis(out_w, src_w, True, _SX, 128) == 0
    assert _sweep_axis(out_w, src_w, False, _SX, 128) == 0


def test_fused_bit_equality_unaligned_height():
    """Bit-parity at a src_h % 8 != 0 shape, at gazes that clamp
    nonzero-width cells against the bottom edge (the exact failure mode
    of the pre-padding geometry: quantized bases fell up to 7 rows short
    of covering bottom-clamped intervals)."""
    fw, fh, rw, rh = 512, 204, 288, 128
    rng = np.random.default_rng(9)
    frame = rng.integers(0, 256, (fh, fw, 3), np.uint8)
    grid = make_grid(rw, rh, fw, fh)
    sat = build_sat(jnp.asarray(frame))
    fr = jnp.asarray(frame.transpose(2, 0, 1))
    for center in ((0.5, 0.97), (0.46, 0.666), (0.0, 1.0)):
        c = jnp.asarray(center, jnp.float32)
        want = sample_rect_from_sat(sat, grid, c)
        got = sample_rect_fused(fr, grid, c, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_wrap_pad_covers_every_window():
    """The y pass's wrap pad must cover the largest PARTIAL-band x window
    past any quantized base (base <= W - 128, so pad >= maxk - 128
    suffices; the orchestrator allocates ceil(maxk / wb) blocks >= maxk).
    Whole-period bands (k == W) anchor at base 0 and read only [0, W),
    so they consume no pad — the orchestrator sizes the pad from partial
    bands only (zero when every band is whole-period, e.g. 256-wide)."""
    from foveax.kernels.segreduce import _MINOR_CAP_X, _adaptive_bands

    for src_w, out_w in [(1920, 1072), (3840, 2144), (15360, 8544),
                         (640, 352), (256, 144)]:
        g = _grid_axis(out_w, src_w).astype(np.int64)
        bands = _adaptive_bands(g.tobytes(), src_w, _SX, 128, _MINOR_CAP_X, 2)
        partial = [b.k for b, _s in bands if b.k < src_w]
        wb = segreduce._wb(src_w)
        pad = -(-max(partial) // wb) * wb if partial else 0
        for b, _s in bands:
            if b.k < src_w:
                assert (src_w - 128) + b.k <= src_w + pad
            else:  # base 0, window [0, W): inside even with zero pad
                assert b.k <= src_w + pad


def test_fused_bit_equality_all_whole_period_bands():
    """Bit-parity at a width small enough that every x band clamps to
    the whole period: the orchestrator then allocates ZERO wrap pad and
    every window anchors at base 0 (the case the partial-band pad sizing
    must not break)."""
    fw, fh, rw, rh = 256, 128, 144, 64
    rng = np.random.default_rng(11)
    frame = rng.integers(0, 256, (fh, fw, 3), np.uint8)
    grid = make_grid(rw, rh, fw, fh)
    from foveax.kernels.segreduce import _MINOR_CAP_X, _adaptive_bands

    bands = _adaptive_bands(
        np.asarray(grid.gx, np.int64).tobytes(), fw, _SX, 128,
        _MINOR_CAP_X, 2,
    )
    assert all(b.k >= fw for b, _s in bands)
    sat = build_sat(jnp.asarray(frame))
    fr = jnp.asarray(frame.transpose(2, 0, 1))
    for center in ((0.5, 0.5), (0.03, 0.4), (0.999, 0.001), (0.0, 1.0)):
        c = jnp.asarray(center, jnp.float32)
        want = sample_rect_from_sat(sat, grid, c)
        got = sample_rect_fused(fr, grid, c, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_batch_api_matches_sat_batch(setup):
    """sample_rect_fused_batch (lax.map over gazes, one compiled kernel
    set) is bit-identical to the amortized-SAT vmapped batch.
    reference: src/video_server.cc:62-85."""
    from foveax.kernels.segreduce import sample_rect_fused_batch

    grid, sat, fr = setup
    centers = jnp.asarray(
        [[0.5, 0.5], [0.03, 0.4], [0.97, 0.6], [0.0, 1.0]], jnp.float32
    )
    ref = np.asarray(
        jax.vmap(lambda c: sample_rect_from_sat(sat, grid, c))(centers)
    )
    got = np.asarray(
        sample_rect_fused_batch(fr, grid, centers, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)
    chw = np.asarray(
        sample_rect_fused_batch(
            fr, grid, centers, out_layout="chw", interpret=True
        )
    )
    np.testing.assert_array_equal(ref.transpose(0, 3, 1, 2), chw)


def test_fused_eligible_probe(setup):
    """fused_eligible is the single source of truth for every auto
    policy: True exactly when the kernels' structural contract admits
    the shape (trace-only, no compile), for single and batch, both wrap
    modes."""
    grid, _, _ = setup
    for batch in (False, True):
        assert segreduce.fused_eligible(grid, SRC_H, SRC_W, batch=batch)
        assert segreduce.fused_eligible(
            grid, SRC_H, SRC_W, wrap_x=False, batch=batch
        )
    # 96-wide fails the kernel's width-block contract (same shape the
    # pipeline auto tests pin as the degrade case).
    g2 = make_grid(48, 32, 96, 64)
    for batch in (False, True):
        assert not segreduce.fused_eligible(g2, 64, 96, batch=batch)


@pytest.mark.parametrize("grid_mode", ["0", "1"])
def test_batch_duplicate_and_edge_clamped_gazes(setup, grid_mode, monkeypatch):
    """One batched launch containing a DUPLICATE gaze pair and
    edge-clamped gazes (both corners) decodes each slice bit-equal to
    the single-gaze path — the serving hot path never sees curated
    batches (pinned from the round-5 fuzz batch lane).  Covers both the
    default lax.map batch and the opt-in grid-batched variant."""
    from foveax.kernels.segreduce import sample_rect_fused_batch

    monkeypatch.setenv("FOVEAX_BATCH_GRID", grid_mode)
    grid, sat, fr = setup
    centers = jnp.asarray(
        [[0.37, 0.81], [0.37, 0.81], [0.0, 0.0], [1.0, 1.0], [0.999, 0.001]],
        jnp.float32,
    )
    got = np.asarray(
        sample_rect_fused_batch(fr, grid, centers, interpret=True)
    )
    for i, c in enumerate(np.asarray(centers)):
        want = np.asarray(
            sample_rect_from_sat(sat, grid, jnp.asarray(c, jnp.float32))
        )
        np.testing.assert_array_equal(got[i], want, err_msg=f"gaze {i}")
    np.testing.assert_array_equal(got[0], got[1])


def test_batch_grid_matches_lax_map(setup, monkeypatch):
    """The round-5 grid-batched path (gaze axis in the Pallas grid,
    chunked) is bit-identical to the round-4 lax.map path, including
    chunk padding (5 gazes at chunk=2 -> 3 groups with a padded tail)."""
    from foveax.kernels import segreduce

    grid, sat, fr = setup
    centers = jnp.asarray(
        [[0.5, 0.5], [0.03, 0.4], [0.97, 0.6], [0.0, 1.0], [0.42, 0.13]],
        jnp.float32,
    )
    monkeypatch.setenv("FOVEAX_BATCH_GRID_CHUNK", "2")
    # Grid path is opt-in since the on-chip A/B measured it slower than
    # lax.map at the serving shapes (2026-08-21); parity stays pinned.
    monkeypatch.setenv("FOVEAX_BATCH_GRID", "1")
    got = np.asarray(
        segreduce.sample_rect_fused_batch(fr, grid, centers, interpret=True)
    )
    monkeypatch.setenv("FOVEAX_BATCH_GRID", "0")
    want = np.asarray(
        segreduce.sample_rect_fused_batch(fr, grid, centers, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("center", [(0.5, 0.5), (0.03, 0.4), (0.999, 0.001)])
def test_fused_int8_dots_bit_equal(setup, center, monkeypatch):
    """FOVEAX_SEGREDUCE_INT8=1 (MXU int8 dots, round 5) stays bit-equal
    to the SAT path: 0/1 weights and x-128 pixels fit s8, the s32 dot is
    exact, and +128*(interval width) undoes the shift."""
    monkeypatch.setenv("FOVEAX_SEGREDUCE_INT8", "1")
    grid, sat, fr = setup
    c = jnp.asarray(center, jnp.float32)
    ref = np.asarray(sample_rect_from_sat(sat, grid, c))
    got = np.asarray(sample_rect_fused(fr, grid, c, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_batch_int8_dots_bit_equal(setup, monkeypatch):
    """The gaze-batched kernels honor FOVEAX_SEGREDUCE_INT8 too (they
    share _y_kernel/_x_kernel) — bit-equal to the SAT batch."""
    from foveax.kernels.segreduce import sample_rect_fused_batch

    monkeypatch.setenv("FOVEAX_SEGREDUCE_INT8", "1")
    grid, sat, fr = setup
    centers = jnp.asarray(
        [[0.5, 0.5], [0.03, 0.4], [0.999, 0.001]], jnp.float32
    )
    ref = np.asarray(
        jax.vmap(lambda c: sample_rect_from_sat(sat, grid, c))(centers)
    )
    got = np.asarray(
        sample_rect_fused_batch(fr, grid, centers, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)
