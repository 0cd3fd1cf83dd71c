"""Quality metrics + quality CLI."""

import jax.numpy as jnp
import numpy as np

from foveax.core.metrics import eccentricity_weighted_psnr, foveal_psnr, psnr


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
