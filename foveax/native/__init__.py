"""ctypes loader for the native library, with on-demand build.

``load()`` returns the loaded CDLL or None.  The library is built with the
in-tree Makefile on first use (g++, no external deps) and cached under
``foveax/native/build/``.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

log = logging.getLogger("foveax.native")

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "build" / "libfoveax_native.so"
_lib: ctypes.CDLL | None = None
_tried = False


def build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO.exists()
    except Exception as e:  # pragma: no cover - toolchain missing
        log.warning("native build failed: %s", e)
        return False


def load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() and not build():
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.fvx_init_segment.restype = ctypes.c_int
    lib.fvx_init_segment.argtypes = [
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.fvx_fragment.restype = ctypes.c_int
    lib.fvx_fragment.argtypes = [
        ctypes.c_uint32,
        ctypes.c_uint64,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_uint32,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def init_segment(width: int, height: int, sample_format: bytes = b"jpeg") -> bytes:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    cap = 4096
    buf = ctypes.create_string_buffer(cap)
    n = lib.fvx_init_segment(width, height, sample_format, buf, cap)
    if n < 0:
        raise RuntimeError("fvx_init_segment: buffer too small")
    return buf.raw[:n]


def fragment(
    seq: int, decode_time: int, sample: bytes, duration: int, *, is_sync: bool = True
) -> bytes:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    cap = len(sample) + 512
    buf = ctypes.create_string_buffer(cap)
    n = lib.fvx_fragment(
        seq, decode_time, sample, len(sample), duration, int(is_sync), buf, cap
    )
    if n < 0:
        raise RuntimeError("fvx_fragment: buffer too small")
    return buf.raw[:n]


def available() -> bool:
    return load() is not None
