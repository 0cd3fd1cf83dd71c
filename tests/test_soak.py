"""Serving soak test: sustained session churn must leave no residue.

The reference's server leaked detached encoder threads and per-connection
OpenCL contexts on disconnect (reference: src/video_server.cc:213-239 —
threads are detached, never joined; src/video_server.cc:53-66 — one
context per connection with no eviction).  foveax's design claim is the
opposite: all session state is owned by the asyncio loop, native codec
handles are released deterministically on close, and the pipeline cache
is a bounded LRU.  This test drives repeated join/stream/leave churn
across multiple stream shapes and wire codecs and asserts every pool
returns to its floor: sessions, channels, native handles (the
`live_native_handles` probe counts live Encoder/Decoder/Demuxer objects
inside the C++ libs), process file descriptors, and Python threads.
"""

import asyncio
import gc
import os
import threading

import pytest

from foveax.io.wirecodec import available_wire_codecs
from foveax.native import live_native_handles
from foveax.serve.client import FoveaxClient
from foveax.serve.server import FoveaxServer
from tests.test_serve import CFG, _free_port


def _fd_count() -> int:
    return len(os.listdir("/proc/self/fd"))


@pytest.mark.parametrize(
    "wire", ["jpeg"] + (["h264"] if "h264" in available_wire_codecs() else [])
)
def test_session_churn_leaves_no_residue(wire):
    port = _free_port()
    server = FoveaxServer(
        CFG, broadcast=True, max_frames=400, wire_codec=wire,
        loop_videos=True,
    )

    # Two source shapes rotate through the bounded pipeline LRU.  The
    # server serves its base CFG as-is and derives with_source() configs
    # for other shapes — mirror that derivation client-side.
    videos = ["synthetic://96x64@30/50", "synthetic://128x96@30/50"]
    cfgs = {videos[0]: CFG, videos[1]: CFG.with_source(128, 96)}

    async def one_cycle(cycle: int):
        video = videos[cycle % len(videos)]
        clients = [
            FoveaxClient(
                f"ws://127.0.0.1:{port}",
                video=video,
                config=cfgs[video],
                gaze_source=lambda i, k=k: (0.2 + 0.2 * k, 0.5),
                max_frames=3,
            )
            for k in range(3)
        ]
        stats = await asyncio.wait_for(
            asyncio.gather(*(c.run() for c in clients)), timeout=60
        )
        assert all(s.frames == 3 for s in stats)

    async def main():
        import websockets

        async with websockets.serve(
            server.handle, "127.0.0.1", port, max_size=64 * 1024 * 1024
        ):
            # Let the first cycle absorb one-time costs (jit compile,
            # lazy imports, thread-pool spin-up) before baselining.
            await one_cycle(0)
            gc.collect()
            fd0 = _fd_count()
            threads0 = threading.active_count()
            for cycle in range(1, 9):
                await one_cycle(cycle)
            # Teardown settles via the channels' finally blocks; yield.
            for _ in range(10):
                await asyncio.sleep(0.05)
                if not server.sessions and not server.channels:
                    break
            return fd0, threads0

    fd0, threads0 = asyncio.run(main())
    gc.collect()

    # Session/channel pools empty; pipeline cache bounded by its LRU cap.
    assert not server.sessions
    assert not server.channels
    assert len(server._pipelines) <= server.max_pipelines

    # Native handle pools at zero: every per-session encoder and every
    # client demuxer/decoder was released despite 8 cycles of churn.
    for name, count in live_native_handles().items():
        assert count == 0, (name, count, wire)

    # No fd or thread creep beyond the post-warmup baseline (executor
    # threads are created lazily up to the pool cap during warmup; churn
    # afterwards must not add more).
    assert _fd_count() <= fd0 + 4, (fd0, _fd_count())
    assert threading.active_count() <= threads0 + 4, (
        threads0, threading.active_count(),
    )
