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
