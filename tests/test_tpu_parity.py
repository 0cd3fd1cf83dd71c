"""Hardware-parity lane (VERDICT round-1 item #4): golden comparisons that
must hold ON THE REAL BACKEND, not just the CPU lowering the default test
run uses.  A Mosaic/XLA-TPU regression surfaces here as a red test rather
than a silently wrong benchmark.

Run: ``FOVEAX_TPU_TESTS=1 python -m pytest -m tpu tests/`` with the real
backend available (alone — the tunnel admits one process).  In the default
CPU run every test here is skipped.

Sizes are kept to one compiled shape per function (remote compiles cost
15-40 s each through the tunnel).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core import golden
from foveax.core.logrect import make_grid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat
from foveax.core.unwarp import unwarp_rect

pytestmark = pytest.mark.tpu

W, H = 1024, 512  # multiple of 128 so the Pallas paths are eligible
RW, RH = 576, 288


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(99)
    yy, xx = np.mgrid[0:H, 0:W]
    base = np.stack(
        [(xx * 255 // W), (yy * 255 // H), ((xx // 6 % 2) * 255)], axis=-1
    ).astype(np.uint8)
    noise = rng.integers(0, 40, base.shape, np.uint8)
    return np.clip(base.astype(np.int32) + noise, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def grids():
    g = make_grid(RW, RH, W, H)
    dense = golden.grid_dense(RW, RH, W, H)
    gj = dataclasses.replace(
        g, gx=jnp.asarray(dense[0, :, 0]), gy=jnp.asarray(dense[:, 0, 1])
    )
    return gj, dense


def test_backend_is_accelerator():
    assert jax.default_backend() != "cpu"


def test_xla_sat_matches_golden_on_device(frame):
    want = golden.build_sat(frame)
    got = np.asarray(jax.jit(build_sat)(jnp.asarray(frame)))
    np.testing.assert_array_equal(got, want)


def test_pallas_sat_matches_golden_on_device(frame):
    from foveax.kernels.scan2d import build_sat_pallas

    want = golden.build_sat(frame)
    got = np.asarray(jax.jit(build_sat_pallas)(jnp.asarray(frame)))
    np.testing.assert_array_equal(got, want)


def test_fused_select_matches_build_plus_gather_on_device(frame):
    from foveax.kernels.fused_select import sat_select_rows

    sat = golden.build_sat(frame)  # (3, H, W)
    pymc = np.sort(np.unique(np.linspace(0, H - 2, 40, dtype=np.int32)))
    pyc = pymc + 1
    frame_rcw = jnp.asarray(frame.transpose(0, 2, 1).reshape(H, 3, W))

    def run(f):
        return sat_select_rows(f, jnp.asarray(pyc), jnp.asarray(pymc))

    hi, lo = jax.jit(run)(frame_rcw)
    np.testing.assert_array_equal(np.asarray(hi)[:, :3], sat[:, pyc].transpose(1, 0, 2))
    np.testing.assert_array_equal(np.asarray(lo)[:, :3], sat[:, pymc].transpose(1, 0, 2))


def test_sample_matches_golden_on_device(frame, grids):
    gj, dense = grids
    sat_np = golden.build_sat(frame)
    sat = jax.jit(build_sat)(jnp.asarray(frame))
    for center in [(0.5, 0.5), (0.03, 0.4), (0.97, 0.6)]:
        want = golden.sample_rect(sat_np, dense, center)
        got = np.asarray(
            jax.jit(sample_rect_from_sat)(
                sat, gj, jnp.asarray(center, jnp.float32)
            )
        )
        np.testing.assert_array_equal(got, want)


def test_fast_unwarp_within_one_lsb_on_device(frame, grids):
    gj, dense = grids
    sat_np = golden.build_sat(frame)
    reduced = golden.sample_rect(sat_np, dense, (0.5, 0.5))
    rj = jnp.asarray(reduced)
    c = jnp.asarray((0.5, 0.5), jnp.float32)
    exact = np.asarray(
        jax.jit(unwarp_rect, static_argnums=(1, 2))(rj, W, H, c)
    ).astype(np.int16)
    fast = np.asarray(
        jax.jit(
            lambda r, cc: unwarp_rect(r, W, H, cc, precision="fast")
        )(rj, c)
    ).astype(np.int16)
    assert np.abs(exact - fast).max() <= 1


def test_mm_unwarp_within_one_lsb_on_device(frame, grids):
    """precision="mm" (slab + integer-numerator MXU dots) vs the exact
    path ON THE DEVICE — this is where the bf16-exactness of the integer
    weights (core/unwarp._mm_int_weights) is actually exercised; the CPU
    suite runs the f32 fallback.  Two gazes: centered, and near the seam
    so the jump-tile fixup engages."""
    gj, dense = grids
    sat_np = golden.build_sat(frame)

    fn = jax.jit(
        lambda r, cc: (
            unwarp_rect(r, W, H, cc).astype(jnp.int32),
            unwarp_rect(r, W, H, cc, precision="mm").astype(jnp.int32),
        )
    )
    for center in ((0.5, 0.5), (0.03, 0.5)):
        reduced = golden.sample_rect(sat_np, dense, center)
        exact, mm = fn(
            jnp.asarray(reduced), jnp.asarray(center, jnp.float32)
        )
        d = np.abs(np.asarray(exact) - np.asarray(mm))
        assert d.max() <= 1, (center, d.max())


def test_full_path_device_matches_cpu_backend(frame, grids):
    """One full frame (SAT -> sample -> unwarp) computed on the
    accelerator vs the same jitted program on the CPU backend.  The SAT +
    sample stages are integer-exact across backends (asserted above); the
    unwarp's inverse log map uses exp/pow, whose 1-ulp backend differences
    move an occasional blend weight one quantum — the project-wide ≤1 LSB
    envelope applies (measured: 0.04% of pixels, all off by exactly 1)."""
    gj, _ = grids
    c = jnp.asarray((0.37, 0.62), jnp.float32)

    def full(f, cc):
        sat = build_sat(f)
        red = sample_rect_from_sat(sat, gj, cc)
        return unwarp_rect(red, W, H, cc)

    dev = np.asarray(jax.jit(full)(jnp.asarray(frame), c)).astype(np.int16)
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        cpu = np.asarray(
            jax.jit(full)(
                jax.device_put(frame, cpu_dev), jax.device_put(c, cpu_dev)
            )
        ).astype(np.int16)
    diff = np.abs(dev - cpu)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.005  # disagreements stay rare


# --- round-3 extension: production shapes + full kernel inventory ----------
# (VERDICT r2 missing #2: the lane covered one 1024x512 shape; every K-row
# of SURVEY.md section-2.2 now has at least one on-chip red/green test.)


def test_flagship_shape_sample_and_mm_unwarp_on_device():
    """The production operating point — 1072x608 reduced from 1920x1080
    (reference: src/parameters.h:8-9) — on the chip: grid sample exact vs
    the float64 golden; mm unwarp within 1 LSB of the exact device path,
    and both within the composite envelope vs the f64 golden (the exact
    path's f32 inverse-log transcendentals flip a snap decision at ~0.06%
    of pixels at this shape, worth up to 2 LSB against the f64 referee —
    the same budget the CPU suite pins)."""
    rng = np.random.default_rng(7)
    fw, fh, rw, rh = 1920, 1080, 1072, 608
    yy, xx = np.mgrid[0:fh, 0:fw]
    frame_np = np.clip(
        np.stack(
            [(xx * 255 // fw), (yy * 255 // fh), ((xx // 5 % 2) * 255)],
            axis=-1,
        ).astype(np.int32)
        + rng.integers(0, 32, (fh, fw, 3)),
        0,
        255,
    ).astype(np.uint8)
    g = make_grid(rw, rh, fw, fh)
    dense = golden.grid_dense(rw, rh, fw, fh)
    gj = dataclasses.replace(
        g, gx=jnp.asarray(dense[0, :, 0]), gy=jnp.asarray(dense[:, 0, 1])
    )

    sample_fn = jax.jit(
        lambda f, cc: sample_rect_from_sat(build_sat(f), gj, cc)
    )
    unwarp_fn = jax.jit(
        lambda r, cc: (
            unwarp_rect(r, fw, fh, cc).astype(jnp.int16),
            unwarp_rect(r, fw, fh, cc, precision="mm").astype(jnp.int16),
        )
    )
    center = (0.43, 0.57)
    red = sample_fn(jnp.asarray(frame_np), jnp.asarray(center, jnp.float32))
    sat_np = golden.build_sat(frame_np)
    want_red = golden.sample_rect(sat_np, dense, center)
    np.testing.assert_array_equal(np.asarray(red), want_red)

    exact, mm = unwarp_fn(red, jnp.asarray(center, jnp.float32))
    exact, mm = np.asarray(exact), np.asarray(mm)
    assert np.abs(exact - mm).max() <= 1  # the mm path's 1-LSB contract
    want_full = golden.unwarp_rect(want_red, fw, fh, center).astype(np.int16)
    # Against the f64 referee the contract is statistical at this shape:
    # TPU exp/pow ulp differences flip the inverse-map ceil at knife-edge
    # cell boundaries (~0.04% of pixels measured), moving the bilinear
    # blend one log cell over — bounded by post-box-filter inter-cell
    # contrast (noise band 32 on this content; measured max 21), not by
    # 1 LSB.  Everywhere else the paths agree to <= 1.
    for got in (exact, mm):
        d = np.abs(got - want_full)
        assert np.median(d) == 0
        assert (d > 1).mean() < 1e-3, (d > 1).mean()
        assert d.max() <= 64, d.max()


def test_sample_360_matches_golden_on_device(frame, grids):
    """K2's 360 variant (sample_rect_360_kernel) on the chip, against its
    own transcribed differential golden (defined-mask semantics)."""
    from foveax.core.sample import sample_rect_360_from_sat

    gj, dense = grids
    sat_np = golden.build_sat(frame)
    sat = jax.jit(build_sat)(jnp.asarray(frame))
    fn = jax.jit(
        lambda s, cc: sample_rect_360_from_sat(s, gj, cc)
    )
    for center in [(0.5, 0.5), (0.04, 0.5)]:
        want, defined = golden.sample_rect_360(sat_np, dense, center)
        got = np.asarray(fn(sat, jnp.asarray(center, jnp.float32)))
        np.testing.assert_array_equal(
            got[defined], want[defined]
        )


def test_point_sample_matches_golden_on_device(frame):
    """K6 (ImageSampler's aliasing baseline) on the chip: exact vs the
    float64 golden."""
    from foveax.core.logrect import make_point_grid
    from foveax.core.sample import sample_rect_point

    g = make_point_grid(RW, RH, W, H)
    fn = jax.jit(lambda f, cc: sample_rect_point(f, g, cc))
    center = (0.31, 0.66)
    got = np.asarray(
        fn(jnp.asarray(frame), jnp.asarray(center, jnp.float32))
    )
    want = golden.sample_rect_point(frame, RW, RH, center)
    np.testing.assert_array_equal(got, want)


def test_logpolar_sample_blur_unwarp_on_device(frame):
    """K7 + K8 (the log-polar comparison technique) on the chip, with the
    CPU suite's golden thresholds (f32-vs-f64 cell-boundary flips)."""
    from foveax.core.logpolar import (
        logpolar_gaussian_blur,
        make_logpolar_grid,
        sample_logpolar,
        unwarp_logpolar,
    )

    g = make_logpolar_grid(RW, RH, W, H)
    center = (0.5, 0.5)
    cc = jnp.asarray(center, jnp.float32)
    sfn = jax.jit(lambda f, c: sample_logpolar(f, g, c))
    red = sfn(jnp.asarray(frame), cc)
    ref = golden.sample_logpolar(frame, RW, RH, center)
    same = (np.asarray(red) == ref).all(axis=-1).mean()
    assert same > 0.97, same

    blurred = np.asarray(jax.jit(logpolar_gaussian_blur)(red))
    ref_blur = golden.logpolar_blur(np.asarray(red))
    assert np.abs(
        blurred.astype(np.int32) - ref_blur.astype(np.int32)
    ).max() <= 1

    out = np.asarray(
        jax.jit(lambda r, c: unwarp_logpolar(r, W, H, c))(red, cc)
    )
    ref_out = golden.unwarp_logpolar(np.asarray(red), W, H, center)
    d = np.abs(out.astype(np.int32) - ref_out.astype(np.int32))
    assert (d <= 1).mean() > 0.97, (d.max(), (d > 1).mean())
    assert np.median(d) == 0


def test_logpolar_pyramid_on_device(frame):
    """K10 (the kernel missing upstream) on the chip: integer box-mean
    pyramid exact vs golden; mip-selected sampling runs and matches the
    CPU backend."""
    from foveax.core.logpolar import (
        build_pyramid,
        make_logpolar_grid,
        sample_logpolar_pyramid,
    )

    fj = jnp.asarray(frame)
    pyr = jax.jit(lambda f: build_pyramid(f, 3))(fj)
    ref = golden.build_pyramid_flat(frame, 3)
    np.testing.assert_array_equal(np.asarray(pyr), ref)

    g = make_logpolar_grid(RW, RH, W, H)
    cc = jnp.asarray((0.4, 0.55), jnp.float32)
    fn = jax.jit(lambda p, c: sample_logpolar_pyramid(p, g, c, 3))
    dev = np.asarray(fn(pyr, cc))
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        cpu = np.asarray(
            jax.jit(lambda p, c: sample_logpolar_pyramid(p, g, c, 3))(
                jax.device_put(np.asarray(pyr), cpu_dev),
                jax.device_put(np.asarray(cc), cpu_dev),
            )
        )
    same = (dev == cpu).all(axis=-1).mean()
    assert same > 0.97, same


def test_gnomonic_on_device(frame):
    """K9 on the chip vs the float64 golden."""
    from foveax.core.gnomonic import gnomonic_project

    center = (0.37, 0.61)
    out = np.asarray(
        jax.jit(lambda f, c: gnomonic_project(f, 256, 128, c))(
            jnp.asarray(frame), jnp.asarray(center, jnp.float32)
        )
    )
    ref = golden.gnomonic_project(frame, 256, 128, center)
    same = (out == ref).all(axis=-1).mean()
    assert same > 0.97, same


def test_svd_create_sample_on_device(frame, grids):
    """K5 (SVD-compressed SAT) on the chip: MXU einsum reconstruction vs
    the float64 golden at full SAT magnitude (~1e8 — this is the test
    that catches default MXU bf16-operand truncation; the einsums demand
    Precision.HIGHEST for exactly this reason), plus reduced-SAT
    create+sample vs direct sampling on a magnitude-controlled frame
    where f32 arithmetic is headroom-exact (intensities 0-3: the probe
    isolates KERNEL parity; the f32 precision ceiling of the SVD path at
    full magnitude is characterized in the CPU suite and BENCHMARKS)."""
    from foveax.core.svd_sat import (
        compress_sat,
        create_reduced_sat,
        reconstruct_sat,
        sample_from_reduced_sat,
    )

    gj, dense = grids
    sat = jax.jit(build_sat)(jnp.asarray(frame))
    svd = compress_sat(sat, rank=30)
    dev = np.asarray(jax.jit(reconstruct_sat)(svd)).astype(np.float64)
    ref = golden.reconstruct_sat_svd(
        svd.u, svd.s, svd.v, svd.residual_q, svd.ranges
    )
    denom = np.maximum(np.abs(ref), 1.0)
    assert (np.abs(dev - ref) / denom).max() < 1e-4

    dim_frame = (frame // 86).astype(np.uint8)  # intensities 0..2
    sat_dim = jax.jit(build_sat)(jnp.asarray(dim_frame))
    svd_full = compress_sat(sat_dim, rank=H)  # exact factorization
    cc = jnp.asarray((0.5, 0.5), jnp.float32)
    fn = jax.jit(
        lambda sv, c: sample_from_reduced_sat(
            create_reduced_sat(sv, gj, c)
        )
    )
    out = np.asarray(fn(svd_full, cc))
    direct = np.asarray(
        jax.jit(
            lambda s, c: sample_rect_from_sat(s, gj, c, wrap_x=False)
        )(sat_dim, cc)
    )
    a = out[40:-40, 60:-60].astype(np.int32)
    b = direct[40:-40, 60:-60].astype(np.int32)
    assert np.abs(a - b).max() <= 1


def test_direct_sampler_matches_golden_on_device(frame, grids):
    """SAT-free direct sampler on the chip: the periphery box sums ride
    real bf16 MXU dots with f32 accumulation and the 8-bit limb split for
    the second contraction — the exactness argument (operands <= 255 and
    0/1 weights are bf16-exact; integer f32 sums < 2^24) must hold on the
    hardware MXU, not just the CPU f32 fallback the default suite uses."""
    from foveax.core.direct import sample_rect_direct

    gj, dense = grids
    sat_np = golden.build_sat(frame)
    fr = jnp.asarray(frame.transpose(2, 0, 1))
    fn = jax.jit(lambda c: sample_rect_direct(fr, gj, c))
    for center in [(0.5, 0.5), (0.03, 0.4), (0.97, 0.6), (0.0, 1.0)]:
        want = golden.sample_rect(sat_np, dense, center)
        got = np.asarray(fn(jnp.asarray(center, jnp.float32)))
        np.testing.assert_array_equal(got, want)


def test_fused_sampler_matches_golden_on_device(frame, grids):
    """Pallas segment-reduce sampler on the chip: gaze-windowed HBM->VMEM
    DMAs with scalar-prefetched bases, in-VMEM one-hot dots, and the
    fused exact division must reproduce the float64 golden bit-for-bit
    (Mosaic lowering, not the interpret-mode emulation the CPU suite
    uses)."""
    from foveax.kernels.segreduce import sample_rect_fused

    gj, dense = grids
    sat_np = golden.build_sat(frame)
    fr = jnp.asarray(frame.transpose(2, 0, 1))
    fn = jax.jit(lambda c: sample_rect_fused(fr, gj, c))
    for center in [(0.5, 0.5), (0.03, 0.4), (0.97, 0.6), (1.0, 0.0)]:
        want = golden.sample_rect(sat_np, dense, center)
        got = np.asarray(fn(jnp.asarray(center, jnp.float32)))
        np.testing.assert_array_equal(got, want)


def test_fused_unwarp_within_one_lsb_on_device(frame, grids):
    """Pallas fused unwarp on the chip: double-buffered slab DMAs with
    8-quantized (sub-tile) window bases, in-kernel integer-numerator
    dots, and the Mosaic f32 divide must hold the <= 1 LSB contract
    against the exact gather path, with the fovea bit-exact — the
    lane-misaligned DMA starts and device divide rounding are exactly
    what interpret mode cannot exercise."""
    from foveax.kernels.unwarp_pl import unwarp_rect_fused

    gj, dense = grids
    sat_np = golden.build_sat(frame)
    fn = jax.jit(
        lambda r, cc: (
            unwarp_rect(r, W, H, cc).astype(jnp.int32),
            unwarp_rect_fused(r, W, H, cc).astype(jnp.int32),
        )
    )
    for center in ((0.5, 0.5), (0.03, 0.5)):
        reduced = golden.sample_rect(sat_np, dense, center)
        exact, fused = fn(
            jnp.asarray(reduced), jnp.asarray(center, jnp.float32)
        )
        exact, fused = np.asarray(exact), np.asarray(fused)
        d = np.abs(exact - fused)
        assert d.max() <= 1, (center, d.max())
        cx = int(np.float32(center[0]) * W)
        cy = int(np.float32(center[1]) * H)
        np.testing.assert_array_equal(
            fused[cy - 3 : cy + 3, cx - 3 : cx + 3],
            exact[cy - 3 : cy + 3, cx - 3 : cx + 3],
        )


def test_flagship_composed_fused_path_on_device():
    """bench.py's Pallas candidate, composed at the flagship operating
    point (1920x1080 -> 1072x608 -> 1080p, reference src/parameters.h:8-9):
    the fused sampler's reduced frame must be bit-identical to the f64
    golden, and the fused unwarp of that same frame must stay within
    1 LSB of the exact device path with the fovea window bit-exact —
    the contract the composed step inherits from its two halves, checked
    here as ONE pipeline (window/base handoffs included) on real Mosaic."""
    from foveax.kernels.segreduce import sample_rect_fused
    from foveax.kernels.unwarp_pl import unwarp_rect_fused

    rng = np.random.default_rng(11)
    fw, fh, rw, rh = 1920, 1080, 1072, 608
    yy, xx = np.mgrid[0:fh, 0:fw]
    frame_np = np.clip(
        np.stack(
            [(xx * 255 // fw), (yy * 255 // fh), ((xx // 3 % 2) * 255)],
            axis=-1,
        ).astype(np.int32)
        + rng.integers(0, 32, (fh, fw, 3)),
        0,
        255,
    ).astype(np.uint8)
    g = make_grid(rw, rh, fw, fh)
    dense = golden.grid_dense(rw, rh, fw, fh)
    gj = dataclasses.replace(
        g, gx=jnp.asarray(dense[0, :, 0]), gy=jnp.asarray(dense[:, 0, 1])
    )

    fr = jnp.asarray(frame_np.transpose(2, 0, 1))
    step = jax.jit(
        lambda c: (
            lambda red: (
                red,
                unwarp_rect_fused(
                    red, fw, fh, c, in_layout="chw", out_layout="chw"
                ),
                unwarp_rect(
                    red, fw, fh, c, in_layout="chw", out_layout="chw"
                ),
            )
        )(sample_rect_fused(fr, gj, c, out_layout="chw"))
    )
    sat_np = golden.build_sat(frame_np)
    for center in ((0.43, 0.57), (0.02, 0.5)):
        red, fused, exact = step(jnp.asarray(center, jnp.float32))
        want_red = golden.sample_rect(sat_np, dense, center).transpose(2, 0, 1)
        np.testing.assert_array_equal(np.asarray(red), want_red)
        fused = np.asarray(fused).astype(np.int16)
        exact = np.asarray(exact).astype(np.int16)
        d = np.abs(fused - exact)
        assert d.max() <= 1, (center, d.max())
        cx = int(np.float32(center[0]) * fw)
        cy = int(np.float32(center[1]) * fh)
        ys = slice(max(cy - 3, 0), cy + 3)
        xs = slice(max(cx - 3, 0), cx + 3)
        np.testing.assert_array_equal(fused[:, ys, xs], exact[:, ys, xs])


def test_ssim_matches_golden_on_device(frame):
    """The SSIM convs must carry Precision.HIGHEST: the MXU truncates
    f32 conv operands to bf16 by default, and the E[x^2]-mu^2 variance
    cancellation on a*a (up to 65025) would then be wrong by its own
    magnitude in smooth regions.  CPU tests can't see this — only the
    chip can."""
    from foveax.core import metrics

    rng = np.random.default_rng(7)
    a = frame[:128, :128].astype(np.float64)
    b = np.clip(a + rng.normal(0, 6, a.shape), 0, 255)
    want = golden.ssim64(a, b)
    got = float(
        jax.jit(metrics.ssim)(
            jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
        )
    )
    assert abs(got - want) < 1e-4, (got, want)
