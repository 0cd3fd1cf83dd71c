"""Wire serialization for SVD-compressed SATs.

The reference's experimental path compresses a SAT as rank-r factors plus
a quantized residual (reference: src/sat_decoder_sample_rect_kernel.cl:1-136,
src/sat_decoder.cc:774-885) but never wires it into a driver; foveax turns
it into a serving mode: the server streams ONE ``fxsv`` sample per source
frame (gaze-independent), and each client builds its own gaze-aligned
reduced SAT locally (foveax.core.svd_sat.create_reduced_sat) — foveation
moves client-side, so gaze latency is zero and one stream serves any
number of gazes.

Layout (little-endian):
    magic  b"FXSV"  | u16 version | u16 rank | u32 height | u32 width
    f32 ranges[3]
    u (3, H, r) float16 | s (3, r) float32 | v (3, r, W) float16
    residual_q (H, W, 3) uint8
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"FXSV"
VERSION = 1

SAMPLE_FORMAT = b"fxsv"  # stsd sample entry fourcc for this payload


def pack_svd(svd) -> bytes:
    """SVDSat -> wire bytes.  Factors travel as float16 (the rank-r
    approximation tolerates it; the residual absorbs the quantization at
    reconstruction scale)."""
    u = np.asarray(svd.u, dtype=np.float16)
    s = np.asarray(svd.s, dtype=np.float32)
    v = np.asarray(svd.v, dtype=np.float16)
    res = np.asarray(svd.residual_q, dtype=np.uint8)
    ranges = np.asarray(svd.ranges, dtype=np.float32)
    _, h, r = u.shape
    w = v.shape[2]
    header = MAGIC + struct.pack("<HHII", VERSION, r, h, w)
    return b"".join(
        [header, ranges.tobytes(), u.tobytes(), s.tobytes(), v.tobytes(), res.tobytes()]
    )


def unpack_svd(data: bytes):
    """Wire bytes -> SVDSat (jnp arrays, factors promoted back to f32)."""
    import jax.numpy as jnp

    from foveax.core.svd_sat import SVDSat

    if data[:4] != MAGIC:
        raise ValueError("not an FXSV payload")
    if len(data) < 16 + 12:
        # Normalize truncation to the caller contract (ValueError, as
        # np.frombuffer already raises for short factor sections) —
        # struct.unpack_from would raise struct.error instead.
        raise ValueError("truncated FXSV payload")
    version, r, h, w = struct.unpack_from("<HHII", data, 4)
    if version != VERSION:
        raise ValueError(f"unsupported FXSV version {version}")
    off = 4 + 12
    ranges = np.frombuffer(data, np.float32, 3, off)
    off += 12
    u = np.frombuffer(data, np.float16, 3 * h * r, off).reshape(3, h, r)
    off += 2 * 3 * h * r
    s = np.frombuffer(data, np.float32, 3 * r, off).reshape(3, r)
    off += 4 * 3 * r
    v = np.frombuffer(data, np.float16, 3 * r * w, off).reshape(3, r, w)
    off += 2 * 3 * r * w
    res = np.frombuffer(data, np.uint8, h * w * 3, off).reshape(h, w, 3)
    return SVDSat(
        u=jnp.asarray(u, jnp.float32),
        s=jnp.asarray(s),
        v=jnp.asarray(v, jnp.float32),
        residual_q=jnp.asarray(res),
        ranges=jnp.asarray(ranges),
    )


def payload_size(height: int, width: int, rank: int) -> int:
    """Exact wire bytes for given dimensions (for bandwidth planning)."""
    return (
        16
        + 12
        + 2 * 3 * height * rank
        + 4 * 3 * rank
        + 2 * 3 * rank * width
        + height * width * 3
    )
