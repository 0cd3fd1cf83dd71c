"""Property-based fuzzing of the trust boundaries: protocol parsing and
the incremental fMP4 demuxers (VERDICT round-1 item #9).

Invariants under test:
  * protocol.loads never raises anything but ValueError, and round-trips
    every message it accepts;
  * the Python and native demuxers produce IDENTICAL observable state
    (samples, dims, codec info, seq, error/no-error) for every input,
    regardless of how the byte stream is split into feed() chunks;
  * truncated/corrupt/garbage boxes never produce wrong samples — only a
    clean stall (waiting for more bytes) or a loud ValueError.

No hypothesis dependency in this image — a seeded PRNG drives the case
generation (deterministic, so failures are reproducible).
"""

import json
import os
import struct

import numpy as np
import pytest

from foveax.io.mux import FragmentReader, FragmentWriter
from foveax.serve import protocol

# Soak knob: FOVEAX_FUZZ_SEED_BASE shifts every generator seed, so CI
# stays deterministic (base 0) while soak runs explore fresh corpora
# (failures still reproduce by re-exporting the same base).
_SEED = int(os.environ.get("FOVEAX_FUZZ_SEED_BASE", "0"))


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed + _SEED)

try:
    from foveax.native import NativeDemuxer, available as native_available

    HAVE_NATIVE = native_available()
except ImportError:  # pragma: no cover
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


# --- protocol ---------------------------------------------------------------


def test_protocol_fuzz_only_valueerror(
):
    rng = _rng(42)
    corpus = [
        "",
        "{",
        "[]",
        "null",
        "123",
        '"str"',
        '{"type": "nope"}',
        '{"type": "frameRequest"}',
        '{"type": "frameRequest", "centerX": "a", "centerY": 0, "packetNumber": 0}',
        '{"type": "frameRequest", "centerX": NaN, "centerY": 0.5, "packetNumber": 1}',
        '{"type": "frameRequest", "centerX": Infinity, "centerY": 0.5, "packetNumber": 1}',
        '{"type": "ack", "packetNumber": [1]}',
        '{"type": "image", "centerX": 0.5, "centerY": 0.5, "frameNum": "x"}',
        '{"type": null}',
        '{"type": 5}',
        '{"type": "text"}',
    ]
    # Random byte soup and random JSON-ish objects.
    for _ in range(200):
        n = int(rng.integers(0, 64))
        corpus.append(bytes(rng.integers(32, 127, n)).decode("ascii"))
    for _ in range(200):
        obj = {
            "type": str(
                rng.choice(["text", "ack", "image", "frameRequest", "zzz"])
            )
        }
        for k in rng.choice(
            ["message", "centerX", "centerY", "packetNumber", "frameNum", "junk"],
            size=int(rng.integers(0, 4)),
            replace=False,
        ):
            obj[str(k)] = [None, 1.5, "s", [1], {"a": 1}][int(rng.integers(0, 5))]
        corpus.append(json.dumps(obj))

    for payload in corpus:
        try:
            msg = protocol.loads(payload)
        except ValueError:
            continue
        # Anything accepted must round-trip losslessly.
        assert protocol.loads(protocol.dumps(msg)) == msg


def test_protocol_roundtrip_random_valid():
    rng = _rng(43)
    for _ in range(200):
        msg = [
            protocol.TextMessage(str(rng.integers(0, 1 << 30))),
            protocol.VideoRequest("v" * int(rng.integers(1, 40))),
            protocol.FrameRequest(
                float(rng.random()), float(rng.random()), int(rng.integers(0, 1 << 31))
            ),
            protocol.Ack(int(rng.integers(0, 1 << 31))),
            protocol.FrameMeta(
                float(rng.random()), float(rng.random()), int(rng.integers(0, 256))
            ),
        ][int(rng.integers(0, 5))]
        assert protocol.loads(protocol.dumps(msg)) == msg


# --- demuxers ---------------------------------------------------------------


def _observe(demux, chunks):
    """Feed chunks; return comparable observable state."""
    samples = []
    err = None
    for c in chunks:
        try:
            samples.extend(bytes(s) for s in demux.feed(c))
        except ValueError as e:
            err = "corrupt"
            break
    return {
        "samples": samples,
        "err": err,
        "header": bool(demux.header_seen),
        "headers": int(demux.header_count),
        "dims": (demux.width, demux.height) if demux.header_seen else None,
        "seq": demux.last_seq,
        "fmt": getattr(demux, "sample_format", None),
        "cfg": getattr(demux, "codec_config", None),
    }


def _random_splits(rng, data: bytes, n_cases: int):
    for _ in range(n_cases):
        k = int(rng.integers(1, 12))
        cuts = sorted(rng.integers(0, len(data) + 1, k).tolist())
        points = [0] + cuts + [len(data)]
        yield [data[a:b] for a, b in zip(points[:-1], points[1:]) if b > a]


def _valid_stream(rng, codec_config=None) -> bytes:
    mux = FragmentWriter(
        48, 32, 30.0,
        b"avc1" if codec_config else b"jpeg",
        codec_config=codec_config,
        backend="python",
    )
    out = mux.header()
    for i in range(int(rng.integers(1, 6))):
        payload = bytes(rng.integers(0, 256, int(rng.integers(0, 400))))
        out += mux.frame(payload, is_sync=(i == 0))
    return out


@needs_native
def test_demuxers_agree_on_random_splits():
    """Both demuxer backends must expose identical state for every split
    of a valid stream — including mid-box-header splits."""
    rng = _rng(44)
    for cfg in (None, (b"avcC", bytes(range(20)))):
        stream = _valid_stream(rng, cfg)
        for chunks in _random_splits(rng, stream, 30):
            a = _observe(FragmentReader(), chunks)
            b = _observe(NativeDemuxer(), chunks)
            assert a == b, f"split disagreement: {[len(c) for c in chunks]}"


@needs_native
def test_demuxers_agree_on_corruption():
    """Bit flips in box headers / truncations / garbage prefixes: the two
    backends must fail (or stall) identically and never emit different
    samples."""
    rng = _rng(45)
    base = _valid_stream(rng, (b"avcC", b"\x01\x64\x00\x1e\xff"))
    cases = []
    for _ in range(60):  # random single-byte corruptions
        b = bytearray(base)
        b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    for _ in range(20):  # truncations
        cases.append(base[: int(rng.integers(0, len(base)))])
    for _ in range(20):  # garbage prefix/suffix
        g = bytes(rng.integers(0, 256, int(rng.integers(1, 32))))
        cases.append(g + base if rng.random() < 0.5 else base + g)
    cases.append(struct.pack(">I", 3) + b"mdat")  # size < 8
    cases.append(b"\x00" * 7)  # less than one header
    for data in cases:
        for chunks in _random_splits(rng, data, 3):
            a = _observe(FragmentReader(), chunks)
            b = _observe(NativeDemuxer(), chunks)
            assert a == b


@needs_native
def test_demuxers_agree_on_pure_garbage():
    rng = _rng(46)
    for _ in range(100):
        data = bytes(rng.integers(0, 256, int(rng.integers(0, 300))))
        for chunks in _random_splits(rng, data, 2):
            assert _observe(FragmentReader(), chunks) == _observe(
                NativeDemuxer(), chunks
            )


def test_wire_decoder_survives_hostile_samples():
    """Corrupted/garbage h264 samples must yield a frame (libavcodec
    error concealment), None, or a clean IOError — never another
    exception type or a crash of the receive loop's process."""
    from foveax.io.wirecodec import available_wire_codecs, make_wire_decoder

    if "h264" not in available_wire_codecs():
        pytest.skip("h264 shim unavailable")
    from foveax.io.wirecodec import WireEncoder

    enc = WireEncoder("h264", 96, 64, 30.0, crf=30)
    rng = _rng(50)
    samples = [
        enc.encode(rng.integers(0, 256, (64, 96, 3), np.uint8))[0]
        for _ in range(3)
    ]
    cfg = enc.codec_config
    enc.close()
    cases = []
    for i in range(30):  # random multi-byte corruption of real samples
        s = bytearray(samples[i % 3])
        for _ in range(int(rng.integers(1, 6))):
            s[int(rng.integers(0, len(s)))] = int(rng.integers(0, 256))
        cases.append(bytes(s))
    for _ in range(15):  # pure garbage
        cases.append(bytes(rng.integers(0, 256, int(rng.integers(0, 400)))))
    for data in cases:
        dec = make_wire_decoder(b"avc1", cfg, size_hint=(96, 64))
        try:
            out = dec.decode(data)
            assert out is None or out.shape == (64, 96, 3)
        except IOError:
            pass
        finally:
            dec.close()


def test_svdwire_unpack_only_valueerror():
    """The FXSV payload parser (SVD serving mode) must raise ValueError
    — never struct.error or a numpy shape crash — on every truncation
    and on random header corruption (the client treats ValueError as
    'corrupt stream'; anything else kills the receive loop)."""
    jnp = pytest.importorskip("jax.numpy")
    from foveax.core.svd_sat import SVDSat
    from foveax.io.svdwire import pack_svd, unpack_svd

    rng = _rng(49)
    h, w, r = 16, 24, 4
    svd = SVDSat(
        u=jnp.asarray(rng.normal(size=(3, h, r)), jnp.float32),
        s=jnp.asarray(rng.normal(size=(3, r)), jnp.float32),
        v=jnp.asarray(rng.normal(size=(3, r, w)), jnp.float32),
        residual_q=jnp.asarray(
            rng.integers(0, 256, (h, w, 3)), jnp.uint8
        ),
        ranges=jnp.asarray(rng.uniform(1, 9, 3), jnp.float32),
    )
    data = pack_svd(svd)
    unpack_svd(data)  # the full payload parses
    for n in range(0, len(data), 97):  # every stride-97 truncation
        try:
            unpack_svd(data[:n])
        except ValueError:
            pass
    for _ in range(60):  # random header corruption
        b = bytearray(data)
        b[int(rng.integers(4, 16))] = int(rng.integers(0, 256))
        try:
            unpack_svd(bytes(b))
        except ValueError:
            pass


def test_demuxer_byte_at_a_time():
    """Worst-case fragmentation: one byte per feed."""
    rng = _rng(47)
    stream = _valid_stream(rng, (b"avcC", b"\x01\x42\x00\x1e"))
    whole = _observe(FragmentReader(), [stream])
    trickle = _observe(FragmentReader(), [bytes([b]) for b in stream])
    assert whole == trickle
    assert whole["err"] is None and whole["header"]


@needs_native
def test_demuxers_agree_on_renegotiated_streams():
    """Mid-stream renegotiation (serve --adapt-rate): a second init
    segment with new dims/codec config must update both demuxers
    identically — dims, sample format, codec config, AND header_count
    (the client rebuilds its decoder when that increments) — across
    random feed splits."""
    rng = _rng(48)
    for _ in range(12):
        d1 = (int(rng.integers(2, 40)) * 16, int(rng.integers(2, 24)) * 16)
        d2 = (int(rng.integers(2, 40)) * 16, int(rng.integers(2, 24)) * 16)
        m1 = FragmentWriter(
            *d1, 30.0, b"avc1",
            codec_config=(b"avcC", bytes(rng.integers(0, 256, 12))),
            backend="python",
        )
        m2 = FragmentWriter(
            *d2, 30.0, b"jpeg" if rng.random() < 0.5 else b"avc1",
            codec_config=(b"avcC", bytes(rng.integers(0, 256, 9)))
            if rng.random() < 0.7
            else None,
            backend="python",
        )
        stream = m1.header()
        for i in range(int(rng.integers(1, 4))):
            stream += m1.frame(
                bytes(rng.integers(0, 256, int(rng.integers(0, 200)))),
                is_sync=(i == 0),
            )
        stream += m2.header()
        for i in range(int(rng.integers(1, 4))):
            stream += m2.frame(
                bytes(rng.integers(0, 256, int(rng.integers(0, 200)))),
                is_sync=(i == 0),
            )
        for chunks in _random_splits(rng, stream, 6):
            a = _observe(FragmentReader(), chunks)
            b = _observe(NativeDemuxer(), chunks)
            assert a == b, (d1, d2, [len(c) for c in chunks])
            assert a["headers"] == 2 and a["dims"] == d2


@needs_native
def test_demuxers_agree_on_empty_mdat():
    """A zero-payload mdat is a valid (empty) sample, not end-of-queue:
    the native fvx_demux_next used to return 0 for both, so one empty
    sample silently stalled the whole drained batch (seed-11006 soak).
    Both backends must yield [b'', b'abcd', b'efgh'] from one feed."""
    mux = FragmentWriter(48, 32, 30.0, b"jpeg", backend="python")
    stream = (
        mux.header()
        + mux.frame(b"", is_sync=True)
        + mux.frame(b"abcd")
        + mux.frame(b"efgh")
    )
    want = [b"", b"abcd", b"efgh"]
    assert FragmentReader().feed(stream) == want
    assert [bytes(s) for s in NativeDemuxer().feed(stream)] == want


@needs_native
def test_demuxers_agree_on_unparseable_tkhd():
    """A moov whose trak size overruns the box: the header still counts
    as seen (the fragments keep flowing) but tkhd never parses — both
    demuxers must then report dims (0, 0) (the seed-3045 soak caught the
    Python twin reporting (None, None) against the native's zeros)."""
    rng = _rng(6)
    data = bytearray(_valid_stream(rng, (b"avcC", b"\x01\x42\x00\x1e")))
    i = bytes(data).find(b"trak")
    assert i > 4
    struct.pack_into(">I", data, i - 4, 0xFFFFFFFF)
    a = _observe(FragmentReader(), [bytes(data)])
    b = _observe(NativeDemuxer(), [bytes(data)])
    assert a == b, (a, b)
    assert a["header"] and a["dims"] == (0, 0)
    assert a["samples"]  # mdat payloads still flow past the bad moov


def test_demuxers_agree_on_short_mfhd():
    """Deterministic corruption the random sweeps rarely hit: an mfhd
    whose size field shrinks to less than its 8-byte payload.  Both
    demuxers must skip the truncated box identically (no struct.error,
    no garbage last_seq) — the native parser guards blen >= 8 and the
    Python twin must match."""
    if not native_available():
        pytest.skip("native demuxer unavailable")
    rng = _rng(5)
    data = bytearray(_valid_stream(rng))
    # Find the first mfhd box and shrink its size field to 9 (payload 1).
    i = bytes(data).find(b"mfhd")
    assert i > 4
    import struct as _struct

    _struct.pack_into(">I", data, i - 4, 9)
    chunks = [bytes(data)]
    a = _observe(FragmentReader(), chunks)
    b = _observe(NativeDemuxer(), chunks)
    assert a == b, (a, b)
