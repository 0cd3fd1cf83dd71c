"""Fused Pallas unwarp: interpret-mode parity vs the exact path + static
window invariants at production sizes.

The kernels' correctness rests on the slab-window guarantee: every
output cell's (lo, lo+step) tap pair must land inside its block's
quantized window, except the edge-collapse columns the post-kernel
fixup repairs (x axis only, capacity _FIX_K).  The sweeps below check
that over ALL integer gazes per axis at the production unwarp grids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core.unwarp import _axis_vectors, unwarp_rect
from foveax.kernels.unwarp_pl import (
    _FIX_K,
    _KY,
    _QX,
    _QY,
    _SY,
    _x_geom,
    unwarp_rect_fused,
)

# WR must clear _KX (the x slab width: 384, since DMA lane offsets and
# slice sizes need 128-alignment on hardware); OUT_W a 128 multiple.
HR, WR, OUT_H, OUT_W = 64, 416, 128, 512

CENTERS = [
    (0.5, 0.5),
    (0.03, 0.4),
    (0.97, 0.6),
    (0.0, 0.0),
    (1.0, 1.0),
    (0.31, 0.87),
    (0.999, 0.001),
]


@pytest.fixture(scope="module")
def reduced(rng_mod=np.random.default_rng(7)):
    return jnp.asarray(rng_mod.integers(0, 256, (HR, WR, 3), np.uint8))


@pytest.mark.parametrize("center", CENTERS)
def test_fused_within_one_lsb_of_exact(reduced, center):
    c = jnp.asarray(center, jnp.float32)
    exact = np.asarray(unwarp_rect(reduced, OUT_W, OUT_H, c))
    got = np.asarray(
        unwarp_rect_fused(reduced, OUT_W, OUT_H, c, interpret=True)
    )
    d = np.abs(exact.astype(np.int32) - got.astype(np.int32))
    assert d.max() <= 1, (center, d.max(), (d > 1).sum())


def test_fused_via_precision_dispatch(reduced):
    """unwarp_rect(precision="fused") routes to the kernels (interpret
    on the CPU backend) and honors layouts."""
    c = jnp.asarray((0.4, 0.7), jnp.float32)
    hwc = np.asarray(unwarp_rect(reduced, OUT_W, OUT_H, c, precision="fused"))
    chw = np.asarray(
        unwarp_rect(
            reduced.transpose(2, 0, 1), OUT_W, OUT_H, c,
            in_layout="chw", out_layout="chw", precision="fused",
        )
    )
    np.testing.assert_array_equal(hwc, chw.transpose(1, 2, 0))
    exact = np.asarray(unwarp_rect(reduced, OUT_W, OUT_H, c))
    assert np.abs(exact.astype(np.int32) - hwc.astype(np.int32)).max() <= 1


def test_fused_no_recompile_on_gaze(reduced):
    """Gaze is a traced array end-to-end: the kernels' bases/weights are
    scalar-prefetched traced values, so moving the gaze never recompiles
    (the project-wide invariant, CLAUDE.md)."""
    fn = jax.jit(
        lambda c: unwarp_rect_fused(reduced, OUT_W, OUT_H, c, interpret=True)
    )
    fn(jnp.asarray([0.5, 0.5], jnp.float32))
    n0 = fn._cache_size()
    fn(jnp.asarray([0.13, 0.88], jnp.float32))
    assert fn._cache_size() == n0


def test_fused_fovea_identity(rng):
    """The fovea must stay bit-exact (exact integer quotients survive
    the +0.01-guarded truncation)."""
    red = rng.integers(0, 256, (HR, WR, 3), np.uint8)
    out = np.asarray(
        unwarp_rect_fused(
            jnp.asarray(red), OUT_W, OUT_H,
            jnp.asarray([0.5, 0.5], jnp.float32), interpret=True,
        )
    )
    k = 6
    cx, cy = OUT_W // 2, OUT_H // 2
    np.testing.assert_array_equal(
        out[cy - k : cy + k + 1, cx - k : cx + k + 1],
        red[HR // 2 - k : HR // 2 + k + 1, WR // 2 - k : WR // 2 + k + 1],
    )


def test_fused_flagship_size(rng):
    """One flagship 1072x608 -> 1920x1080 frame through the kernels in
    interpret mode: <= 1 LSB of exact, fovea bit-exact."""
    red = rng.integers(0, 256, (608, 1072, 3), np.uint8)
    c = jnp.asarray([0.37, 0.62], jnp.float32)
    got = np.asarray(
        unwarp_rect_fused(jnp.asarray(red), 1920, 1080, c, interpret=True)
    )
    exact = np.asarray(unwarp_rect(jnp.asarray(red), 1920, 1080, c))
    d = np.abs(exact.astype(np.int32) - got.astype(np.int32))
    assert d.max() <= 1, (d.max(), (d > 1).sum())
    cx, cy = int(np.float32(0.37) * 1920), int(np.float32(0.62) * 1080)
    np.testing.assert_array_equal(
        got[cy - 3 : cy + 3, cx - 3 : cx + 3],
        np.asarray(exact)[cy - 3 : cy + 3, cx - 3 : cx + 3],
    )


def _sweep_axis(out_dim, red_dim, wrap, gazes, out_h=None):
    """(window violations, worst per-gaze fixup load, fixup capacity)
    over given gazes — computed by the REAL kernel geometry (_x_geom +
    _block_geom), not a transcription, so the sweep can't drift from the
    implementation.  ``out_h`` feeds the x pass's per-shape geometry
    chooser (the VMEM-budgeted row block)."""
    from foveax.kernels.unwarp_pl import _block_geom

    if wrap:
        lx, kx, _hb = _x_geom(out_dim, out_h, red_dim)
        assert lx, (out_dim, out_h, red_dim)
        s_cells, k, q = lx, kx, _QX
        cap = max(_FIX_K, 2 * lx)
    else:
        s_cells, k, q, cap = _SY, _KY, _QY, 0

    def geom(cp):
        lo, hi, _r, nm, dn, _ms = _axis_vectors(
            out_dim, red_dim, cp, wrap=wrap
        )
        return _block_geom(lo, hi, nm, dn, s_cells, red_dim, k, q, wrap=wrap)

    f = jax.jit(geom)
    viol, worst_bad = 0, 0
    for cp in gazes:
        base, rel, s, _nm, _dn, badf = (np.asarray(a) for a in f(jnp.int32(cp)))
        # Neutralized cells stay in-slab even before the fixup.
        viol += int(((rel < 0) | (rel + s > k - 1)).sum())
        if wrap:
            worst_bad = max(worst_bad, int(badf.sum()))
        else:
            viol += int(badf.sum())
            viol += int((base + k > red_dim).sum())
    return viol, worst_bad, cap


@pytest.mark.parametrize(
    "dims",
    [
        (1072, 608, 1920, 1080),
        (2144, 1200, 3840, 2160),
        (WR, HR, OUT_W, OUT_H),
    ],
    ids=["1080p", "4k", "testsize"],
)
def test_kernel_window_invariants_all_integer_gazes(dims):
    red_w, red_h, out_w, out_h = dims
    vy, _, _ = _sweep_axis(out_h, red_h, False, range(0, out_h + 1))
    assert vy == 0, "y windows must never overflow (no fixup on y)"
    _, worst, cap = _sweep_axis(
        out_w, red_w, True, range(0, out_w + 1), out_h=out_h
    )
    # Half-capacity margin: the dense sweeps measure one full jump block
    # per gaze (127) in every geometry incl. the slack-shaved default —
    # demand fix_k headroom rather than a margin of one.
    assert worst <= cap // 2, (worst, cap)


@pytest.mark.parametrize("mode", ["shave", "wide", "r3"])
def test_kernel_window_invariants_large_strided(mode, monkeypatch):
    """8K/16K grids in every geometry mode, strided gazes + the
    worst-case jump-block gazes a dense offline sweep identified (dense
    sweeps are minutes-long)."""
    monkeypatch.setenv("FOVEAX_UNWARP_GEOM", mode)
    for red_w, red_h, out_w, out_h in [
        (4272, 2400, 7680, 4320),
        (8544, 4800, 15360, 8640),
    ]:
        vy, _, _ = _sweep_axis(out_h, red_h, False, range(0, out_h + 1, 97))
        assert vy == 0
        _, worst, cap = _sweep_axis(
            out_w, red_w, True, range(0, out_w + 1, 101), out_h=out_h
        )
        assert worst <= cap // 2, (mode, worst, cap)


@pytest.mark.parametrize("mode", ["wide", "r3"])
def test_fused_parity_alternate_geometries(rng, mode, monkeypatch):
    """The non-default geometries stay <= 1 LSB of exact at the flagship
    shape (the default 'shave' mode is covered by every other test)."""
    monkeypatch.setenv("FOVEAX_UNWARP_GEOM", mode)
    red = rng.integers(0, 256, (608, 1072, 3), np.uint8)
    c = jnp.asarray([0.83, 0.22], jnp.float32)
    got = np.asarray(
        unwarp_rect_fused(jnp.asarray(red), 1920, 1080, c, interpret=True)
    )
    monkeypatch.delenv("FOVEAX_UNWARP_GEOM")
    exact = np.asarray(unwarp_rect(jnp.asarray(red), 1920, 1080, c))
    d = np.abs(exact.astype(np.int32) - got.astype(np.int32))
    assert d.max() <= 1, (mode, d.max(), (d > 1).sum())


def test_x_geom_production_shapes(monkeypatch):
    """The per-shape x geometry in all three modes: the default
    slack-shaved 128/256, the wide 512/768 slabs at 8K/16K, the round-3
    floor — and a budget that never exceeds the cap."""
    from foveax.kernels.unwarp_pl import _X_VMEM_CAP, _x_budget

    cases = {
        "shave": {
            (1920, 1080, 1072): (128, 256, 1080),
            (3840, 2160, 2144): (128, 256, 2160),
            (7680, 4320, 4272): (128, 256, 1440),
            (15360, 8640, 8544): (128, 256, 1440),
        },
        "wide": {
            (1920, 1080, 1072): (384, 640, 1080),
            (3840, 2160, 2144): (128, 384, 2160),
            (7680, 4320, 4272): (512, 768, 480),
            (15360, 8640, 8544): (512, 768, 576),
        },
        "r3": {
            (1920, 1080, 1072): (128, 384, 1080),
            (3840, 2160, 2144): (128, 384, 2160),
            (7680, 4320, 4272): (128, 384, 1440),
            (15360, 8640, 8544): (128, 384, 1440),
        },
    }
    for mode, shapes in cases.items():
        monkeypatch.setenv("FOVEAX_UNWARP_GEOM", mode)
        for (ow, oh, rw), want in shapes.items():
            lx, kx, hb = _x_geom(ow, oh, rw)
            assert (lx, kx, hb) == want, (mode, (ow, oh, rw), (lx, kx, hb))
            assert _x_budget(hb, kx, lx) <= _X_VMEM_CAP
            assert ow % lx == 0 and oh % hb == 0
            assert hb == oh or hb % 32 == 0


def test_fused_rejects_unsupported_shapes(reduced):
    c = jnp.asarray([0.5, 0.5], jnp.float32)
    with pytest.raises(ValueError):
        unwarp_rect_fused(reduced, 250, OUT_H, c, interpret=True)
    tiny = jnp.zeros((8, 8, 3), jnp.uint8)
    with pytest.raises(ValueError):
        unwarp_rect_fused(tiny, OUT_W, OUT_H, c, interpret=True)
    with pytest.raises(ValueError):
        # > 3000 with no 32-multiple row-block divisor: must fail loudly
        # here, not deep inside Mosaic compilation.
        unwarp_rect_fused(reduced, OUT_W, 4322, c, interpret=True)


@pytest.mark.parametrize("center", [(0.5, 0.5), (0.03, 0.4), (0.999, 0.001)])
def test_fused_int8_dots_match_f32(reduced, center, monkeypatch):
    """FOVEAX_UNWARP_INT8=1 (MXU int8 dots, round 5) is bit-identical to
    the bf16/f32 one-hot path: the s8 weight/pixel transform plus the
    +128*dn correction reconstructs the exact integer numerator."""
    monkeypatch.setenv("FOVEAX_UNWARP_INT8", "1")
    c = jnp.asarray(center, jnp.float32)
    got8 = np.asarray(
        unwarp_rect_fused(reduced, OUT_W, OUT_H, c, interpret=True)
    )
    monkeypatch.setenv("FOVEAX_UNWARP_INT8", "0")
    got = np.asarray(
        unwarp_rect_fused(reduced, OUT_W, OUT_H, c, interpret=True)
    )
    np.testing.assert_array_equal(got, got8)
    exact = np.asarray(unwarp_rect(reduced, OUT_W, OUT_H, c))
    d = np.abs(exact.astype(np.int32) - got8.astype(np.int32))
    assert d.max() <= 1


@pytest.mark.parametrize("center", CENTERS)
def test_fused_xy_order_within_one_lsb_of_exact(reduced, center, monkeypatch):
    """FOVEAX_UNWARP_ORDER=xy (column pass first, on the reduced frame —
    round 5's dot-FLOP lever) keeps the same <= 1 LSB-of-exact contract:
    the quantization roles swap with the passes (round-half intermediate,
    truncating final), mirroring the shipped order's error argument."""
    monkeypatch.setenv("FOVEAX_UNWARP_ORDER", "xy")
    c = jnp.asarray(center, jnp.float32)
    exact = np.asarray(unwarp_rect(reduced, OUT_W, OUT_H, c))
    got = np.asarray(
        unwarp_rect_fused(reduced, OUT_W, OUT_H, c, interpret=True)
    )
    d = np.abs(exact.astype(np.int32) - got.astype(np.int32))
    assert d.max() <= 1, (center, d.max(), (d > 1).sum())


def test_fused_xy_order_fovea_bit_exact(reduced, monkeypatch):
    """In the fovea both axes carry identity weights (num = 0, passthrough)
    in EITHER pass order — the gaze-centered crop must be bit-exact."""
    monkeypatch.setenv("FOVEAX_UNWARP_ORDER", "xy")
    c = jnp.asarray((0.5, 0.5), jnp.float32)
    exact = np.asarray(unwarp_rect(reduced, OUT_W, OUT_H, c))
    got = np.asarray(
        unwarp_rect_fused(reduced, OUT_W, OUT_H, c, interpret=True)
    )
    ch, cw = OUT_H // 2, OUT_W // 2
    s = OUT_H // 16
    np.testing.assert_array_equal(
        exact[ch - s : ch + s, cw - s : cw + s],
        got[ch - s : ch + s, cw - s : cw + s],
    )


def test_fused_xy_int8_matches_xy_f32(reduced, monkeypatch):
    """xy order composes with the int8 dot knob bit-identically."""
    monkeypatch.setenv("FOVEAX_UNWARP_ORDER", "xy")
    c = jnp.asarray((0.31, 0.87), jnp.float32)
    base = np.asarray(
        unwarp_rect_fused(reduced, OUT_W, OUT_H, c, interpret=True)
    )
    monkeypatch.setenv("FOVEAX_UNWARP_INT8", "1")
    got8 = np.asarray(
        unwarp_rect_fused(reduced, OUT_W, OUT_H, c, interpret=True)
    )
    np.testing.assert_array_equal(base, got8)
