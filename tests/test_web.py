"""Browser-client (foveax/web) validation.

No JS runtime exists in this sandbox, so the viewer's math is validated
through a line-by-line Python twin of ``foveax/web/unwarp.js``:
``_axis_vectors_js`` mirrors the JS ``axisVectors`` (every Math.fround
becomes an np.float32 round-trip, JS doubles are Python floats) and
``_shader_unwarp`` mirrors the WebGL fragment shader's normalized-float
4-tap mix + RGBA8 round.  The twin must land inside the same 1-LSB
envelope of the float64 golden that the device paths are held to, and be
exact at the fovea.  The streamInfo side-channel and the --http-port
static server get loopback tests.
"""

import asyncio
import json
import socket
import urllib.request

import numpy as np
import pytest

from foveax.config import FoveaxConfig
from foveax.core import golden
from foveax.serve import protocol
from foveax.serve.protocol import TextMessage, VideoRequest
from foveax.serve.server import FoveaxServer

f32 = np.float32


def _F(x):
    """Math.fround."""
    return float(f32(x))


def _delta64_js(u, out_dim, source_dim):
    au = abs(u)
    mag_f = (source_dim / (np.e - 1.0)) * (
        np.exp((2.0 * au / out_dim) ** 4) - 1.0
    )
    mag = max(au, int(np.trunc(mag_f)))
    return mag * (0 if u == 0 else (1 if u > 0 else -1))


def _axis_vectors_js(out_dim, red_dim, center01, wrap):
    """Twin of foveax/web/unwarp.js::axisVectors."""
    em1 = _F(_F(np.exp(1)) - 1)
    lam_out = _F(_F(out_dim) / em1)
    cp = int(np.trunc(_F(center01 * out_dim)))
    u_off = red_dim // 2 + 2
    lut = {u: _delta64_js(u, red_dim, out_dim) for u in range(-u_off, u_off + 1)}

    half = out_dim // 2
    half_r = red_dim // 2
    out = np.zeros((out_dim, 3), dtype=np.float64)
    sign = lambda v: 0 if v == 0 else (1 if v > 0 else -1)

    for p in range(out_dim):
        shift = 0
        if wrap:
            if p - cp > half:
                shift = -out_dim
            elif p - cp < -half:
                shift = out_dim
        offset = shift != 0
        pw = p + shift
        d = pw - cp

        ad = _F(abs(d))
        x = _F(_F(ad / lam_out) + 1)
        r4 = _F(_F(np.log(x)) ** 0.25)
        u_mag = int(np.ceil(_F(_F(0.5 * red_dim) * r4)))
        u_raw = u_mag * sign(d)
        u = d if (abs(u_raw) > abs(d) or u_raw == 0) else u_raw

        d_calc = lut[u]
        du = -sign(d)
        d_min = abs(lut[u + du]) * sign(u)

        lo = cp + min(d_min, d_calc)
        hi = cp + max(d_min, d_calc)
        u_lo = min(u, u + du)
        u_hi = max(u, u + du)

        if wrap:
            if lo < 0 and not offset:
                u_lo = u_hi
            if hi >= out_dim and not offset:
                u_hi = u_lo
        else:
            if lo < 0:
                u_lo = u_hi
            if hi >= out_dim:
                u_hi = u_lo

        ratio = 0.0 if hi == lo else min(1.0, max(0.0, (pw - lo) / (hi - lo)))
        out[p, 0] = min(red_dim - 1, max(0, u_lo + half_r))
        out[p, 1] = min(red_dim - 1, max(0, u_hi + half_r))
        out[p, 2] = ratio
    return out


def _shader_unwarp(reduced, out_w, out_h, center):
    """Twin of viewer.html's fragment shader: normalized u8 texels,
    float32 mix per axis, round-to-RGBA8 on output."""
    ax = _axis_vectors_js(out_w, reduced.shape[1], center[0], True)
    ay = _axis_vectors_js(out_h, reduced.shape[0], center[1], False)
    tex = reduced.astype(np.float32) / f32(255.0)
    xl = ax[:, 0].astype(int)
    xh = ax[:, 1].astype(int)
    rx = ax[:, 2].astype(np.float32)[None, :, None]
    yl = ay[:, 0].astype(int)
    yh = ay[:, 1].astype(int)
    ry = ay[:, 2].astype(np.float32)[:, None, None]
    tl = tex[yl][:, xl]
    tr = tex[yl][:, xh]
    bl = tex[yh][:, xl]
    br = tex[yh][:, xh]
    top = tl + (tr - tl) * rx
    bot = bl + (br - bl) * rx
    o = top + (bot - top) * ry
    return np.clip(np.round(o * 255.0), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("center", [(0.5, 0.5), (0.1, 0.8), (0.15, 0.3)])
def test_shader_twin_within_one_lsb_of_golden(center):
    rng = np.random.default_rng(7)
    hr, wr, out_w, out_h = 32, 48, 96, 64
    reduced = rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8)
    web = _shader_unwarp(reduced, out_w, out_h, center)
    ref = golden.unwarp_rect(reduced, out_w, out_h, center)
    d = np.abs(web.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 1, d.max()


def test_shader_twin_fovea_identity():
    """Around the gaze the log map is the identity: browser output must
    equal the reduced pixels exactly (what __foveaxCheckFovea asserts
    live in the page)."""
    rng = np.random.default_rng(3)
    hr, wr, out_w, out_h = 32, 48, 96, 64
    reduced = rng.integers(0, 256, size=(hr, wr, 3), dtype=np.uint8)
    web = _shader_unwarp(reduced, out_w, out_h, (0.5, 0.5))
    k = 6
    cx, cy = out_w // 2, out_h // 2
    np.testing.assert_array_equal(
        web[cy - k : cy + k + 1, cx - k : cx + k + 1],
        reduced[hr // 2 - k : hr // 2 + k + 1, wr // 2 - k : wr // 2 + k + 1],
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


CFG = FoveaxConfig(
    source_width=96, source_height=64, reduced_width=48, reduced_height=32
)


def test_stream_info_precedes_header():
    """The server announces source/reduced dims + codec as the first text
    message so config-less clients (the browser viewer) can size their
    unwarp."""
    port = _free_port()
    server = FoveaxServer(CFG, max_frames=2)

    async def main():
        import websockets

        async with websockets.serve(
            server.handle, "127.0.0.1", port, max_size=64 * 1024 * 1024
        ):
            async with websockets.connect(
                f"ws://127.0.0.1:{port}", max_size=64 * 1024 * 1024
            ) as ws:
                await ws.send(
                    protocol.dumps(VideoRequest("synthetic://96x64@30/8"))
                )
                texts, binaries = [], 0
                while binaries < 2:
                    raw = await asyncio.wait_for(ws.recv(), timeout=30)
                    if isinstance(raw, str):
                        texts.append(protocol.loads(raw))
                    else:
                        binaries += 1
                return texts

    texts = asyncio.run(main())
    infos = [
        json.loads(t.message)
        for t in texts
        if isinstance(t, TextMessage) and t.message.startswith("{")
    ]
    assert infos and infos[0]["kind"] == "streamInfo"
    assert infos[0]["sourceWidth"] == 96
    assert infos[0]["sourceHeight"] == 64
    assert infos[0]["reducedWidth"] == 48
    assert infos[0]["reducedHeight"] == 32
    assert len(infos[0]["codec"]) == 4


def test_http_port_serves_viewer():
    from foveax.cli.main import _start_web_server

    httpd = _start_web_server(0, 9562)
    try:
        port = httpd.server_address[1]
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/viewer.html", timeout=10
        ).read()
        js = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/unwarp.js", timeout=10
        ).read()
        assert b"foveax" in html and b"axisVectors" in js
    finally:
        httpd.shutdown()


def test_selftest_golden_up_to_date(tmp_path):
    """The committed browser self-test vectors must match what the
    generator produces from the current shader twin (regenerate with
    scripts/gen_web_golden.py after any unwarp-math change)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    committed = repo / "foveax" / "web" / "selftest_golden.js"
    assert committed.exists(), "run scripts/gen_web_golden.py"
    fresh = tmp_path / "selftest_golden.js"
    subprocess.run(
        [
            _sys.executable,
            str(repo / "scripts" / "gen_web_golden.py"),
            str(fresh),
        ],
        check=True,
        capture_output=True,
    )
    assert committed.read_bytes() == fresh.read_bytes(), (
        "selftest_golden.js is stale — rerun scripts/gen_web_golden.py "
        "and commit the result"
    )


def test_js_box_loop_destructuring_consistent():
    """Static guard for the one JS-only bug class no test can execute
    (no JS engine in this sandbox): every `for (const [a, b, c] of
    this._boxes(...))` loop body must only use box-bound names it
    actually destructured.  (Round-3 regression: an mfhd guard used `e`
    in a loop that destructured only `[fc, s]` — a ReferenceError on
    every fragment, invisible to the Python twins.)"""
    import re
    from pathlib import Path

    src = (
        Path(__file__).resolve().parent.parent / "foveax" / "web" / "unwarp.js"
    ).read_text()
    pat = re.compile(
        r"for \(const \[([^\]]+)\] of this\._boxes\([^)]*\)\) \{"
    )
    box_names = re.compile(r"\b(?:fc|s|e)\d*\b")
    for m in pat.finditer(src):
        declared = {v.strip() for v in m.group(1).split(",")}
        # Body = balanced-brace span following the loop header.
        depth, i = 1, m.end()
        while depth and i < len(src):
            depth += {"{": 1, "}": -1}.get(src[i], 0)
            i += 1
        body = src[m.end():i - 1]
        # Strip nested _boxes loop headers (they declare their own).
        inner_declared = set()
        for im in pat.finditer(body):
            inner_declared |= {v.strip() for v in im.group(1).split(",")}
        used = set(box_names.findall(body))
        undeclared = used - declared - inner_declared
        assert not undeclared, (
            f"loop destructures {sorted(declared)} but body uses "
            f"{sorted(undeclared)}: {m.group(0)}"
        )
