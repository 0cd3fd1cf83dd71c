"""CLI subcommands on synthetic sources (offline-driver integration tests,
the analog of the reference's run_satlogrectilinear subcommands)."""

import numpy as np
import pytest

from foveax.cli.main import main
from foveax.io.gaze import synthetic_trace
from foveax.io.png import load_png
from foveax.io.video import VideoReader


def test_single_frame(tmp_path):
    prefix = str(tmp_path / "sf")
    rc = main(
        ["single_frame", "synthetic://96x64@30/5", "2", prefix, "--gaze", "0.4,0.6"]
    )
    assert rc == 0
    src = load_png(prefix + "_source.png")
    fov = load_png(prefix + "_foveated.png")
    assert src.shape == (64, 96, 3)
    assert fov.shape == (48, 64, 3)  # 16*ceil(dim/1.8/16) per axis


def test_interpolate_sampled(tmp_path):
    prefix = str(tmp_path / "is")
    rc = main(["interpolate_sampled", "synthetic://96x64@30/3", "0", prefix])
    assert rc == 0
    restored = load_png(prefix + "_restored.png")
    src = load_png(prefix + "_source.png")
    assert restored.shape == src.shape == (64, 96, 3)
    # Fovea at default gaze center is exact.
    np.testing.assert_array_equal(restored[31:34, 47:50], src[31:34, 47:50])


def test_encode_bitrate_with_gaze_trace(tmp_path):
    trace = tmp_path / "trace.txt"
    trace.write_text(synthetic_trace(10))
    out = str(tmp_path / "fov.mp4")
    rc = main(
        [
            "encode_bitrate",
            "synthetic://96x64@30/10",
            out,
            "--gaze-trace",
            str(trace),
        ]
    )
    assert rc == 0
    with VideoReader(out) as r:
        assert (r.width, r.height) == (64, 48)
        assert len(list(r)) == 10


def test_foveate_no_encoding_then_decode(tmp_path):
    out1 = str(tmp_path / "roundtrip.mp4")
    rc = main(
        ["foveate_no_encoding", "synthetic://96x64@30/6", out1, "--gaze", "0.5,0.5"]
    )
    assert rc == 0
    with VideoReader(out1) as r:
        assert (r.width, r.height) == (96, 64)

    # decode: unwarp an already-foveated clip.
    fov = str(tmp_path / "fov.mp4")
    main(["encode_bitrate", "synthetic://96x64@30/6", fov])
    out2 = str(tmp_path / "restored.mp4")
    rc = main(
        ["decode", fov, out2, "--width", "96", "--height", "64"]
    )
    assert rc == 0
    with VideoReader(out2) as r:
        assert (r.width, r.height) == (96, 64)
        assert len(list(r)) == 6


def test_single_frame_techniques(tmp_path):
    for tech in ["logrect_point", "logpolar", "logpolar_pyramid"]:
        prefix = str(tmp_path / tech)
        rc = main(
            [
                "single_frame",
                "synthetic://96x64@30/3",
                "1",
                prefix,
                "--technique",
                tech,
            ]
        )
        assert rc == 0
        assert load_png(prefix + "_foveated.png").shape == (48, 64, 3)


def test_viewport(tmp_path):
    out = str(tmp_path / "vp.png")
    rc = main(
        [
            "viewport",
            "synthetic://96x64@30/2",
            "0",
            out,
            "--width",
            "48",
            "--height",
            "24",
        ]
    )
    assert rc == 0
    assert load_png(out).shape == (24, 48, 3)


def test_svd_bench(capsys):
    rc = main(["svd_bench", "synthetic://96x64@30/2", "--rank", "8", "--iters", "1"])
    assert rc == 0
    assert "rel_err" in capsys.readouterr().out


def test_montage(tmp_path):
    out = str(tmp_path / "m.jpg")
    rc = main(
        ["montage", "synthetic://192x128@30/3", "1", out, "--gaze", "0.6,0.4"]
    )
    assert rc == 0
    img = load_png(out)  # cv2 reads jpg too
    assert img.shape == (128, 192, 3)


def test_doctor(capsys):
    rc = main(["doctor"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pallas:" in out and "native muxer:" in out


def test_encode_ladder_smoke(capsys):
    """encode_ladder reports ms/kbit/PSNR/members per point and the
    composed-capacity line (tiny size + 1 preset so it stays fast)."""
    from foveax.io.wirecodec import available_wire_codecs

    codec = "h264" if "h264" in available_wire_codecs() else "jpeg"
    rc = main([
        "encode_ladder", "--codecs", codec, "--presets", "ultrafast",
        "--sizes", "192x96", "--frames", "3", "--bitrate", "0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "members/core" in out
    assert "composed capacity" in out
    assert codec in out


def test_encode_capacity_smoke(capsys):
    from foveax.io.wirecodec import available_wire_codecs

    if "h264" not in available_wire_codecs():
        pytest.skip("native h264 shim not built")
    rc = main([
        "encode_capacity", "--size", "192x96", "--ticks", "4",
        "--max-members", "2", "--workers", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sustained:" in out and "p90 tick encode" in out
