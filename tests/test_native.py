"""Native C++ fMP4 muxer: byte-identical to the Python implementation."""

import pytest

from foveax.io import mux

native = pytest.importorskip("foveax.native")

if not native.available():  # pragma: no cover - toolchain missing
    pytest.skip("native library not built", allow_module_level=True)


def test_init_segment_byte_identical():
    for w, h in [(1072, 608), (96, 64), (3840, 2160)]:
        assert native.init_segment(w, h) == mux.init_segment(w, h)


def test_init_segment_other_sample_format():
    assert native.init_segment(64, 64, b"avc1") == mux.init_segment(
        64, 64, b"avc1"
    )


def test_fragment_byte_identical():
    payloads = [b"x", b"frame" * 100, bytes(range(256)) * 33]
    for i, p in enumerate(payloads):
        a = native.fragment(i + 1, i * 3000, p, 3000)
        b = mux.fragment(i + 1, i * 3000, p, 3000)
        assert a == b, f"payload {i} differs"
    # non-sync sample flags path
    assert native.fragment(9, 123456789, b"q", 3000, is_sync=False) == mux.fragment(
        9, 123456789, b"q", 3000, is_sync=False
    )


def test_writer_prefers_native_and_streams_parse():
    w = mux.FragmentWriter(64, 48, 30.0)
    assert w.backend == "native"
    r = mux.FragmentReader()
    data = w.header() + w.frame(b"AAA") + w.frame(b"BBBB")
    out = r.feed(data)
    assert out == [b"AAA", b"BBBB"]
    assert (r.width, r.height) == (64, 48)

    wp = mux.FragmentWriter(64, 48, 30.0, backend="python")
    assert wp.backend == "python"
    assert wp.header() == w.header()


def test_large_sample_capacity():
    big = b"\xab" * (4 * 1024 * 1024)
    a = native.fragment(1, 0, big, 3000)
    b = mux.fragment(1, 0, big, 3000)
    assert a == b


def test_native_demuxer_parity():
    """Native demuxer behaves identically to the Python FragmentReader on
    the same stream, including awkward chunking and a late join."""
    w = mux.FragmentWriter(96, 64, 30.0)
    payloads = [b"frame-%d" % i * 50 for i in range(6)]
    stream = w.header() + b"".join(w.frame(p) for p in payloads)

    nd = native.NativeDemuxer()
    py = mux.FragmentReader()
    got_n, got_p = [], []
    for i in range(0, len(stream), 41):
        chunk = stream[i : i + 41]
        got_n.extend(nd.feed(chunk))
        got_p.extend(py.feed(chunk))
    assert got_n == payloads == got_p
    assert nd.header_seen and (nd.width, nd.height) == (96, 64)
    assert nd.last_seq == py.last_seq == 6


def test_native_demuxer_large_sample_regrow():
    w = mux.FragmentWriter(32, 32, 30.0)
    big = b"\x5a" * (3 * 1024 * 1024)
    nd = native.NativeDemuxer()
    out = nd.feed(w.header() + w.frame(big))
    assert out == [big]


def test_factory_prefers_native():
    from foveax.io.mux import make_fragment_reader

    r = make_fragment_reader()
    assert type(r).__name__ == "NativeDemuxer"


def test_corrupt_header_raises_both_backends():
    bad = b"\x00\x00\x00\x04XXXX"  # size=4 < 8
    py = mux.FragmentReader()
    with pytest.raises(ValueError):
        py.feed(bad)
    nd = native.NativeDemuxer()
    with pytest.raises(ValueError):
        nd.feed(bad)
