"""IO layer: gaze traces, PNG, video reader/writer, fMP4 mux round-trip."""

import numpy as np
import pytest

from foveax.io.gaze import GazeViewPoints, synthetic_trace
from foveax.io.mux import FragmentReader, FragmentWriter, init_segment
from foveax.io.png import load_png, save_png
from foveax.io.video import (
    SyntheticReader,
    VideoReader,
    VideoWriter,
    decode_jpeg,
    encode_jpeg,
    open_video,
)


def test_gaze_parse_reference_format():
    text = (
        "frame,0,forward,0.5,0.5,eye,0.51,0.49\n"
        "garbage line\n"
        "frame,1,forward,0.52,0.5,eye,0.53,0.48\n"
        "frame,2,forward,-0.1,1e-3,eye,0.5,0.5\n"
    )
    g = GazeViewPoints.from_text(text)
    assert len(g) == 3
    assert g.points[0].gaze_point == (0.51, 0.49)
    # One-frame-lag prediction: first record predicts itself.
    assert g.points[0].pred_gaze_point == (0.51, 0.49)
    assert g.points[1].pred_gaze_point == (0.51, 0.49)
    assert g.points[2].view_point == (-0.1, 0.001)
    assert g.gaze_for_frame(99) == (0.5, 0.5)
    assert g.gaze_array().shape == (3, 2)


def test_synthetic_trace_parses_back():
    g = GazeViewPoints.from_text(synthetic_trace(50))
    assert len(g) == 50
    arr = g.gaze_array()
    assert (arr >= 0).all() and (arr <= 1).all()


def test_png_roundtrip(tmp_path, small_frame):
    p = tmp_path / "frame.png"
    save_png(p, small_frame)
    back = load_png(p)
    np.testing.assert_array_equal(back, small_frame)


def test_synthetic_reader():
    r = SyntheticReader(64, 32, n_frames=5)
    frames = list(r)
    assert len(frames) == 5
    assert frames[0].shape == (32, 64, 3)
    assert (frames[0] != frames[1]).any()  # motion
    r2 = open_video("synthetic://64x32@30/5")
    assert isinstance(r2, SyntheticReader)
    assert r2.fps == 30.0 and r2.n_frames == 5


def test_video_write_read_roundtrip(tmp_path):
    path = tmp_path / "clip.mp4"
    src = SyntheticReader(96, 64, n_frames=8)
    with VideoWriter(path, 96, 64, fps=30.0) as w:
        for f in src:
            w.write(f)
    assert w.n_written == 8
    with VideoReader(path) as r:
        assert (r.width, r.height) == (96, 64)
        frames = list(r)
    assert len(frames) == 8
    # Lossy codec: frames resemble the source.
    src2 = SyntheticReader(96, 64, n_frames=8)
    err = np.abs(
        frames[0].astype(int) - src2.read().astype(int)
    ).mean()
    assert err < 24, err


def test_jpeg_codec_roundtrip(small_frame):
    data = encode_jpeg(small_frame, quality=95)
    back = decode_jpeg(data)
    assert back.shape == small_frame.shape
    assert np.abs(back.astype(int) - small_frame.astype(int)).mean() < 12


def test_mux_init_segment_structure():
    seg = init_segment(1072, 608)
    assert seg[4:8] == b"ftyp"
    # moov follows ftyp
    import struct

    ftyp_size = struct.unpack(">I", seg[:4])[0]
    assert seg[ftyp_size + 4 : ftyp_size + 8] == b"moov"


def test_mux_demux_roundtrip():
    w = FragmentWriter(96, 64, 30.0)
    r = FragmentReader()
    header = w.header()
    payloads = [b"frame-%d" % i * 10 for i in range(5)]
    stream = header + b"".join(w.frame(p) for p in payloads)
    # Feed in awkward chunk sizes to exercise incremental parsing.
    out = []
    for i in range(0, len(stream), 37):
        out.extend(r.feed(stream[i : i + 37]))
    assert out == payloads
    assert r.header_seen
    assert (r.width, r.height) == (96, 64)
    assert r.last_seq == 5


def test_mux_fragment_data_offset_points_at_sample():
    import struct

    w = FragmentWriter(32, 32, 30.0)
    frag = w.frame(b"PAYLOAD")
    moof_size = struct.unpack(">I", frag[:4])[0]
    # mdat payload begins right after the moof + 8-byte mdat header.
    assert frag[moof_size + 8 : moof_size + 15] == b"PAYLOAD"


def test_stream_survives_mid_join():
    """A client that joins after the header still decodes fragments — the
    resumability property of the fragmented layout."""
    w = FragmentWriter(64, 64, 30.0)
    header = w.header()
    frags = [w.frame(b"S%d" % i) for i in range(4)]
    late = FragmentReader()
    got = []
    for f in frags[2:]:
        got.extend(late.feed(f))
    assert got == [b"S2", b"S3"]


def test_looping_reader():
    from foveax.io.video import open_video

    r = open_video("synthetic://32x16@30/3", loop=True)
    frames = [r.read() for _ in range(8)]
    assert all(f is not None for f in frames)
    np.testing.assert_array_equal(frames[0], frames[3])
    np.testing.assert_array_equal(frames[1], frames[4])
    r.close()


def test_init_segment_codec_config_box():
    import struct

    cfg = (b"avcC", b"\x01\x64\x00\x1f\xff")
    seg = init_segment(64, 48, b"avc1", codec_config=cfg)
    assert b"avcC" in seg
    # Box structure: avcC directly follows the fixed visual entry fields.
    i = seg.index(b"avcC")
    size = struct.unpack(">I", seg[i - 4 : i])[0]
    assert size == 8 + len(cfg[1])
    # Without config the box is absent (JPEG default).
    assert b"avcC" not in init_segment(64, 48)


def test_synthetic_pattern_spec():
    """#natural spec selects band-limited content; default stays the
    aliasing-hostile stripes; unknown patterns rejected."""
    from foveax.io.video import SyntheticReader, parse_synthetic_spec

    w, h, fps, n, pat = parse_synthetic_spec("synthetic://64x32@25/7#natural")
    assert (w, h, fps, n, pat) == (64, 32, 25.0, 7, "natural")
    assert parse_synthetic_spec("synthetic://64x32")[4] == "hostile"
    with pytest.raises(ValueError):
        parse_synthetic_spec("synthetic://64x32#plaid")

    nat = SyntheticReader(256, 128, n_frames=2, pattern="natural").read()
    hos = SyntheticReader(256, 128, n_frames=2).read()
    assert nat.shape == hos.shape == (128, 256, 3)
    # Band-limited content has far smaller adjacent-pixel jumps than the
    # stripe pattern.
    import numpy as np

    jump = lambda f: np.abs(np.diff(f.astype(np.int32), axis=1)).mean()
    assert jump(nat) < 0.25 * jump(hos), (jump(nat), jump(hos))


def test_natural1f_spectrum_calibrated():
    """The natural1f pattern must actually have the 1/f amplitude
    spectrum it claims (Field 1987 natural-image statistics): the
    radially-averaged log-amplitude vs log-frequency slope is ~ -1, and
    a meaningful share of AC energy sits ABOVE the best-case reduced-
    stream Nyquist (0.5/1.8 cycles/px) — the regime where the periphery
    must low-pass or alias, i.e. where the paper's claim lives."""
    from foveax.io.video import SyntheticReader

    f = SyntheticReader(512, 256, n_frames=1, pattern="natural1f").read()
    luma = f.astype(np.float64).mean(axis=-1)
    luma -= luma.mean()
    spec = np.abs(np.fft.fft2(luma))
    fy = np.fft.fftfreq(luma.shape[0])[:, None]
    fx = np.fft.fftfreq(luma.shape[1])[None, :]
    freq = np.hypot(fy, fx).ravel()
    amp = spec.ravel()
    # Radial average over log-spaced bins inside [8/512, 0.45].
    edges = np.geomspace(8.0 / 512.0, 0.45, 18)
    centers, means = [], []
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (freq >= lo) & (freq < hi)
        if m.sum() < 8:
            continue
        centers.append(np.sqrt(lo * hi))
        means.append(amp[m].mean())
    slope = np.polyfit(np.log(centers), np.log(means), 1)[0]
    assert -1.35 < slope < -0.65, slope

    # Energy above the reduced Nyquist: for 1/f amplitude (1/f^2 power)
    # the analytic share above 0.278 c/px is ~10%; demand a robust floor
    # far above band-limited content (which has ~0 there).
    e_total = float((amp[freq > 0] ** 2).sum())
    e_high = float((amp[freq > 0.5 / 1.8] ** 2).sum())
    assert e_high / e_total > 0.02, e_high / e_total


def test_photo_pattern():
    """#photo builds a native-scale mosaic of the bundled real
    photograph: deterministic per size, covers arbitrary dimensions,
    and carries genuine high-frequency energy above the reduced-stream
    Nyquist (real photographic statistics, not a model)."""
    pytest.importorskip("matplotlib")
    pytest.importorskip("PIL")
    from foveax.io.video import SyntheticReader, parse_synthetic_spec

    assert parse_synthetic_spec("synthetic://64x32#photo")[4] == "photo"

    a = SyntheticReader(320, 200, n_frames=2, pattern="photo")
    b = SyntheticReader(320, 200, n_frames=2, pattern="photo")
    fa, fb = a.read(), b.read()
    assert fa.shape == (200, 320, 3)
    assert np.array_equal(fa, fb)  # seeded mosaic: reproducible tables
    assert fa.std() > 20  # real content, not flat

    # Above-Nyquist AC energy: real photos keep detail past the
    # best-case reduced-stream Nyquist (0.5/1.8 c/px); band-limited
    # synthetic content has ~none there.
    luma = fa.astype(np.float64).mean(axis=-1)
    luma -= luma.mean()
    spec = np.abs(np.fft.fft2(luma)) ** 2
    fy = np.fft.fftfreq(luma.shape[0])[:, None]
    fx = np.fft.fftfreq(luma.shape[1])[None, :]
    freq = np.hypot(fy, fx)
    e_total = float(spec[freq > 0].sum())
    e_high = float(spec[freq > 0.5 / 1.8].sum())
    assert e_high / e_total > 0.005, e_high / e_total


def test_gaze_fn_synthetic_trace():
    """--gaze-trace synthetic[:seed] yields a deterministic moving trace
    (pursuit + saccades) without a dataset file."""
    import argparse

    from foveax.cli.main import _gaze_fn

    ns = argparse.Namespace(gaze_trace="synthetic:3", gaze=(0.5, 0.5))
    g = _gaze_fn(ns)
    pts = np.asarray([g(i) for i in range(120)])
    assert pts.shape == (120, 2)
    assert np.all((pts >= 0.0) & (pts <= 1.0))
    # It moves (pursuit) and jumps (saccade at the 60-frame boundary).
    steps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert steps.max() > 0.05  # a saccade
    assert 0 < np.median(steps) < 0.05  # smooth pursuit between
    g2 = _gaze_fn(argparse.Namespace(gaze_trace="synthetic:3", gaze=None))
    assert g2(17) == g(17)
