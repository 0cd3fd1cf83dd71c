"""ASAN+UBSAN regression lanes for the native layer.

Builds and runs the sanitizer fuzz drivers (scripts/fuzz_native_*.cc) at
small iteration counts.  These catch the memory bugs the Python
differential fuzz cannot observe — the class that produced the sws_scale
SIMD-tail SEGV and two null-memcpy UBs in round 3.  Deeper soaks:
`scripts/fuzz_native_demux.sh <seed> <iters>` (and _codec).
"""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

needs_gxx = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ unavailable"
)


def _run(script: str, seed: str, iters: str, timeout: int) -> str:
    r = subprocess.run(
        ["bash", str(ROOT / "scripts" / script), seed, iters],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=str(ROOT),
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@needs_gxx
def test_demux_sanitized_fuzz():
    out = _run("fuzz_native_demux.sh", "7", "25", 300)
    assert "clean" in out


@needs_gxx
def test_codec_sanitized_fuzz():
    try:
        from foveax.io.wirecodec import available_wire_codecs

        if "h264" not in available_wire_codecs():
            pytest.skip("h264 shim unavailable")
    except ImportError:
        pytest.skip("native layer unavailable")
    out = _run("fuzz_native_codec.sh", "7", "8", 420)
    assert "clean" in out or "skipping" in out
