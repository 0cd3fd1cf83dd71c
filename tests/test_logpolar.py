"""Log-polar family: grid, sample, blur, inverse, pyramid."""

import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core.logpolar import (
    build_pyramid,
    logpolar_gaussian_blur,
    make_logpolar_grid,
    pyramid_layout,
    sample_logpolar,
    sample_logpolar_pyramid,
    unwarp_logpolar,
)


def test_grid_values_match_formula():
    g = make_logpolar_grid(32, 24, 96, 64)
    d = np.asarray(g.deltas)
    for i, j in [(0, 0), (10, 5), (31, 23), (16, 12)]:
        rho = np.exp(10.0 * (i / 32.0) ** 1.0)
        dx = int(rho * np.cos(j / 24.0 * 2 * np.pi))
        dy = int(rho * np.sin(j / 24.0 * 2 * np.pi))
        assert d[j, i, 0] == dx and d[j, i, 1] == dy


def test_sample_matches_scalar_reference(small_frame):
    h, w, _ = small_frame.shape
    g = make_logpolar_grid(32, 24, w, h)
    center = (0.4, 0.6)
    out = np.asarray(
        sample_logpolar(jnp.asarray(small_frame), g, jnp.asarray(center, jnp.float32))
    )
    d = np.asarray(g.deltas, dtype=np.int64)
    for j in [0, 7, 23]:
        for i in [0, 15, 31]:
            x = int(np.float32(np.float32(center[0]) * w + d[j, i, 0]))
            y = int(np.float32(np.float32(center[1]) * h + d[j, i, 1]))
            x = (x + 10 * w) % w
            y = min(max(y, 0), h - 1)
            np.testing.assert_array_equal(out[j, i], small_frame[y, x])


def test_blur_only_outer_half(small_frame):
    img = jnp.asarray(small_frame[:24, :32])
    out = np.asarray(logpolar_gaussian_blur(img))
    src = small_frame[:24, :32]
    # Inner half untouched.
    np.testing.assert_array_equal(out[:, :16], src[:, :16])
    # Outer half: blurred (weights sum to 0.3377+4*0.1217+4*0.0439=1.0001)
    inner = out[1:-1, 17:-1].astype(np.int32)
    ref = src[1:-1, 17:-1].astype(np.int32)
    assert np.abs(inner - ref).mean() < 40  # changed but sane


def test_blur_weight_math():
    # A unit impulse spreads with the kernel weights.
    img = np.zeros((9, 16, 3), np.uint8)
    img[4, 12] = 200
    out = np.asarray(logpolar_gaussian_blur(jnp.asarray(img)))
    assert out[4, 12, 0] == int(200 * 0.3377)
    assert out[4, 11, 0] == int(200 * 0.1217)
    assert out[3, 11, 0] == int(200 * 0.0439)


def test_logpolar_roundtrip_center_region(small_frame):
    """Near the gaze the log-polar rings are dense; the unwarped image
    should be close to the source there."""
    h, w, _ = small_frame.shape
    g = make_logpolar_grid(64, 48, w, h)
    c = jnp.asarray([0.5, 0.5], jnp.float32)
    red = sample_logpolar(jnp.asarray(small_frame), g, c)
    restored = np.asarray(unwarp_logpolar(red, w, h, c))
    assert restored.shape == (h, w, 3)
    cx, cy = w // 2, h // 2
    err = np.abs(
        restored[cy - 4 : cy + 4, cx - 4 : cx + 4].astype(int)
        - small_frame[cy - 4 : cy + 4, cx - 4 : cx + 4].astype(int)
    ).mean()
    assert err < 32, f"fovea error too high: {err}"


def test_pyramid_layout_matches_host_loop():
    offs, ws, hs = pyramid_layout(96, 64, 4)
    assert offs == (0, 96 * 64, 96 * 64 + 48 * 32, 96 * 64 + 48 * 32 + 24 * 16)
    assert ws == (96, 48, 24, 12)
    assert hs == (64, 32, 16, 8)


def test_pyramid_downsample_box_mean(small_frame):
    pyr = np.asarray(build_pyramid(jnp.asarray(small_frame), 3))
    h, w, _ = small_frame.shape
    offs, ws, hs = pyramid_layout(w, h, 3)
    lvl1 = pyr[offs[1] : offs[1] + ws[1] * hs[1]].reshape(hs[1], ws[1], 3)
    block = small_frame[:2, :2].astype(np.uint32)
    expect = (block[0, 0] + block[0, 1] + block[1, 0] + block[1, 1]) // 4
    np.testing.assert_array_equal(lvl1[0, 0], expect.astype(np.uint8))


def test_pyramid_sample_uses_finer_levels_near_center(small_frame):
    h, w, _ = small_frame.shape
    g = make_logpolar_grid(32, 24, w, h)
    pyr = build_pyramid(jnp.asarray(small_frame), 4)
    c = jnp.asarray([0.5, 0.5], jnp.float32)
    out = np.asarray(sample_logpolar_pyramid(pyr, g, c, 4))
    plain = np.asarray(sample_logpolar(jnp.asarray(small_frame), g, c))
    assert out.shape == plain.shape
    # Innermost rings (radial step < 2, i.e. rho(i)*(e^{10/32}-1) < 2,
    # holding for i <= 5 here) sample level 0 => identical.
    np.testing.assert_array_equal(out[:, :6], plain[:, :6])
    # Outer rings differ somewhere (mip filtering kicked in).
    assert (out[:, 16:] != plain[:, 16:]).any()


def test_unwarp_logpolar_scalar_reference(small_frame):
    """Spot-check the inverse log-polar against direct scalar math from
    the reference kernel formulas (src/image_sampler_interpolate_kernel.cl)."""
    h, w, _ = small_frame.shape
    wr, hr = 32, 24
    g = make_logpolar_grid(wr, hr, w, h)
    center = (0.5, 0.5)
    c = jnp.asarray(center, jnp.float32)
    red = np.asarray(sample_logpolar(jnp.asarray(small_frame), g, c))
    out = np.asarray(unwarp_logpolar(jnp.asarray(red), w, h, c))

    cxp = int(np.float32(center[0]) * w)
    cyp = int(np.float32(center[1]) * h)
    for (x, y) in [(cxp + 7, cyp), (cxp, cyp + 5), (cxp - 9, cyp - 3)]:
        dx, dy = x - cxp, y - cyp
        r = np.sqrt(dx * dx + dy * dy)
        i_f = wr * (np.log(r) / 10.0)
        if dx != 0:
            j_f = (np.arctan(dy / dx) + np.pi * (dx < 0)) * (hr / (2 * np.pi))
            j_f = np.mod(j_f + 2 * hr, hr)
        else:
            j_f = (np.pi / 2 + np.pi * (dy < 0)) * (hr / (2 * np.pi))
        i_idx = int(np.clip(np.floor(i_f + 0.5), 0, wr - 1))
        j_idx = int(np.clip(np.floor(j_f + 0.5), 0, hr - 1))
        # Forward check: if the forward map reproduces (x, y), output must
        # equal the sampled texel exactly.
        rho = np.exp(10.0 * i_idx / wr)
        calc_x = int(np.float32(center[0]) * w + rho * np.cos(j_idx / hr * 2 * np.pi))
        calc_y = int(np.float32(center[1]) * h + rho * np.sin(j_idx / hr * 2 * np.pi))
        if calc_x == x and calc_y == y:
            np.testing.assert_array_equal(out[y, x], red[j_idx, i_idx])
        else:
            # Bilinear result must lie within the hull of the 4 corners.
            mi, ma = int(np.floor(i_f)), int(np.ceil(i_f))
            mi, ma = np.clip([mi, ma], 0, wr - 1)
            mj = int(np.floor(j_f + hr)) % hr
            Mj = int(np.ceil(j_f + hr)) % hr
            corners = red[[mj, mj, Mj, Mj], [mi, ma, mi, ma]].astype(int)
            assert (out[y, x].astype(int) >= corners.min(axis=0) - 1).all()
            assert (out[y, x].astype(int) <= corners.max(axis=0) + 1).all()


def test_sample_matches_float64_golden(small_frame):
    from foveax.core import golden

    w, h = small_frame.shape[1], small_frame.shape[0]
    g = make_logpolar_grid(32, 24, w, h)
    for center in [(0.5, 0.5), (0.25, 0.75)]:
        out = np.asarray(
            sample_logpolar(
                jnp.asarray(small_frame), g, jnp.asarray(center, jnp.float32)
            )
        )
        ref = golden.sample_logpolar(small_frame, 32, 24, center)
        same = (out == ref).all(axis=-1).mean()
        # float32 vs float64 index truncation can shift a texel at cell
        # boundaries; require overwhelming agreement.
        assert same > 0.97, same


def test_blur_matches_float64_golden(small_frame):
    from foveax.core import golden

    img = small_frame[:24, :32]
    out = np.asarray(logpolar_gaussian_blur(jnp.asarray(img)))
    ref = golden.logpolar_blur(img)
    d = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 1, d.max()


def test_unwarp_matches_float64_golden(small_frame):
    from foveax.core import golden
    from foveax.core.logpolar import unwarp_logpolar

    h, w = small_frame.shape[0], small_frame.shape[1]
    g = make_logpolar_grid(32, 24, w, h)
    c = jnp.asarray([0.5, 0.5], jnp.float32)
    red = sample_logpolar(jnp.asarray(small_frame), g, c)
    out = np.asarray(unwarp_logpolar(red, w, h, c))
    ref = golden.unwarp_logpolar(np.asarray(red), w, h, (0.5, 0.5))
    d = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    # f32-vs-f64 radius/angle rounding flips snap/bilinear decisions at
    # cell boundaries; the blended values stay close.
    assert (d <= 1).mean() > 0.97, (d.max(), (d > 1).mean())
    assert np.median(d) == 0


def test_pyramid_matches_float64_golden(small_frame):
    from foveax.core import golden

    pyr = np.asarray(build_pyramid(jnp.asarray(small_frame), 3))
    ref = golden.build_pyramid_flat(small_frame, 3)
    np.testing.assert_array_equal(pyr, ref)  # integer box means: exact
