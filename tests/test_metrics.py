"""Quality metrics + quality CLI."""

import jax.numpy as jnp
import numpy as np

from foveax.core.metrics import (
    eccentricity_weighted_psnr,
    foveal_psnr,
    psnr,
    ws_psnr,
)


def test_psnr_identity_is_huge(small_frame):
    f = jnp.asarray(small_frame)
    assert float(psnr(f, f)) > 80


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3), jnp.uint8)
    b = jnp.full((8, 8, 3), 16, jnp.uint8)  # mse = 256
    # 10*log10(255^2/256) = 24.0485
    assert abs(float(psnr(a, b)) - 24.0485) < 0.01


def test_foveal_psnr_ignores_periphery(small_frame):
    f = small_frame.copy()
    corrupted = f.copy()
    corrupted[:, -8:] = 0  # damage far from the gaze at (0.25, 0.5)
    c = jnp.asarray([0.25, 0.5], jnp.float32)
    fv = float(foveal_psnr(jnp.asarray(corrupted), jnp.asarray(f), c))
    full = float(psnr(jnp.asarray(corrupted), jnp.asarray(f)))
    assert fv > 80  # fovea untouched
    assert full < 40


def test_ecc_weighted_between_full_and_foveal(small_frame):
    f = small_frame.copy()
    corrupted = f.copy()
    corrupted[:, -8:] = 0
    c = jnp.asarray([0.25, 0.5], jnp.float32)
    full = float(psnr(jnp.asarray(corrupted), jnp.asarray(f)))
    ecc = float(
        eccentricity_weighted_psnr(jnp.asarray(corrupted), jnp.asarray(f), c)
    )
    assert ecc > full  # peripheral damage discounted


def test_ws_psnr_uniform_error_equals_planar():
    """Error spread uniformly over the sphere: the cos-latitude weights
    normalize out and WS-PSNR must equal planar PSNR."""
    rng = np.random.default_rng(0)
    a = rng.integers(0, 240, (64, 128, 3), np.uint8)
    b = (a + 7).astype(np.uint8)  # exactly +7 everywhere (no clipping)
    p = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    w = float(ws_psnr(jnp.asarray(a), jnp.asarray(b)))
    assert abs(p - w) < 1e-3


def test_ws_psnr_golden_weights():
    """Float64 NumPy golden: WS-PSNR is the cos-latitude-weighted MSE at
    pixel centers (Sun/Lu/Yu SPL'17 definition, as in JVET-360Lib)."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (32, 64, 3), np.uint8)
    b = rng.integers(0, 256, (32, 64, 3), np.uint8)
    h = a.shape[0]
    wgt = np.cos((np.arange(h) + 0.5 - h / 2.0) * np.pi / h)
    d = a.astype(np.float64) - b.astype(np.float64)
    m = (d * d * wgt[:, None, None]).sum() / (wgt.sum() * a.shape[1] * 3)
    want = 10.0 * np.log10(255.0**2 / m)
    got = float(ws_psnr(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-3


def test_ws_psnr_downweights_polar_error():
    """The same error energy hurts less at the poles than at the equator
    — the property that makes 360 quality tables defensible."""
    base = np.full((64, 128, 3), 128, np.uint8)
    at_pole = base.copy()
    at_pole[:4] = 0  # top rows = pole
    at_equator = base.copy()
    at_equator[30:34] = 0  # same number of damaged rows at the equator
    wp = float(ws_psnr(jnp.asarray(at_pole), jnp.asarray(base)))
    we = float(ws_psnr(jnp.asarray(at_equator), jnp.asarray(base)))
    pp = float(psnr(jnp.asarray(at_pole), jnp.asarray(base)))
    assert wp > we  # polar damage discounted
    assert wp > pp  # ws > planar for pole-concentrated error


def test_quality_cli(capsys):
    from foveax.cli.main import main

    rc = main(
        [
            "quality",
            "synthetic://96x64@30/4",
            "--max-frames",
            "3",
            "--techniques",
            "logrect",
            "logpolar",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "logrect:" in out and "logpolar:" in out and "foveal=" in out


def test_quality_cli_through_codec(capsys):
    from foveax.cli.main import main

    rc = main(
        [
            "quality",
            "synthetic://96x64@30/4",
            "--max-frames",
            "3",
            "--techniques",
            "logrect",
            "--through-codec",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "through codec" in out and "foveal=" in out


def test_ssim_matches_float64_golden():
    """Device SSIM vs the float64 NumPy oracle (golden.py::ssim64)."""
    import jax.numpy as jnp

    from foveax.core.golden import ssim64
    from foveax.core.metrics import ssim

    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (40, 56, 3), np.uint8)
    b = np.clip(
        a.astype(np.int32) + rng.integers(-25, 26, a.shape), 0, 255
    ).astype(np.uint8)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    want = ssim64(a, b)
    assert abs(got - want) < 1e-5, (got, want)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999


def test_ssim_penalizes_blur_more_than_psnr():
    """The reason SSIM joins the tables (VERDICT r3 #7): PSNR flatters
    blur.  Construct a blurred copy and a noisy copy with the SAME MSE;
    SSIM must rank the blur *lower* relative to its PSNR twin."""
    import jax.numpy as jnp

    from foveax.core.metrics import mse, psnr, ssim

    rng = np.random.default_rng(11)
    # Structured content: smooth gradients + edges.
    y, x = np.mgrid[0:64, 0:96]
    img = (
        96.0 + 80.0 * np.sin(x / 7.0) + 60.0 * (y > 32) + 10.0 * (x % 5)
    ).clip(0, 255)
    a = np.repeat(img[..., None], 3, axis=2).astype(np.float32)
    # Blur: 5x5 box filter.
    k = 5
    pad = np.pad(a, ((k // 2,) * 2, (k // 2,) * 2, (0, 0)), mode="edge")
    blur = np.zeros_like(a)
    for dy in range(k):
        for dx in range(k):
            blur += pad[dy : dy + 64, dx : dx + 96]
    blur /= k * k
    target = float(mse(jnp.asarray(a), jnp.asarray(blur)))
    # Noise scaled to the same MSE -> identical PSNR by construction.
    noise = rng.normal(size=a.shape).astype(np.float32)
    noise *= np.sqrt(target / (noise**2).mean())
    noisy = a + noise
    p_blur = float(psnr(jnp.asarray(a), jnp.asarray(blur)))
    p_noise = float(psnr(jnp.asarray(a), jnp.asarray(noisy)))
    assert abs(p_blur - p_noise) < 0.2
    s_blur = float(ssim(jnp.asarray(a), jnp.asarray(blur)))
    s_noise = float(ssim(jnp.asarray(a), jnp.asarray(noisy)))
    assert s_blur < s_noise - 0.02, (s_blur, s_noise)


def test_foveal_ssim_ignores_periphery():
    """Corrupt only the periphery: foveal SSIM stays ~1 while full-frame
    SSIM drops (the SSIM twin of test_foveal_psnr_ignores_periphery),
    including across the 360 x-wrap seam."""
    import jax.numpy as jnp

    from foveax.core.metrics import foveal_ssim, ssim

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (64, 96, 3), np.uint8)
    b = a.copy()
    # Gaze at the seam (cx=0): the foveal disc wraps; corrupt a far band.
    b[:, 30:60] = rng.integers(0, 256, (64, 30, 3), np.uint8)
    c = jnp.asarray([0.0, 0.5], jnp.float32)
    f = float(foveal_ssim(jnp.asarray(a), jnp.asarray(b), c))
    full = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert f > 0.99, f
    assert full < 0.9, full


def test_ecc_weighted_ssim_between_full_and_foveal():
    import jax.numpy as jnp

    from foveax.core.metrics import (
        eccentricity_weighted_ssim,
        foveal_ssim,
        ssim,
    )

    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (64, 96, 3), np.uint8)
    b = a.copy()
    b[:, 48:] = rng.integers(0, 256, (64, 48, 3), np.uint8)  # right half
    c = jnp.asarray([0.25, 0.5], jnp.float32)
    full = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    fov = float(foveal_ssim(jnp.asarray(a), jnp.asarray(b), c))
    ecc = float(eccentricity_weighted_ssim(jnp.asarray(a), jnp.asarray(b), c))
    assert full < ecc < fov, (full, ecc, fov)
