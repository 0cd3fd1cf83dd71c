"""Host-side transcode runner: decode prefetch double-buffered against
device compute.

The reference's server loop decodes a frame, builds the SAT, then sleeps to
the 30 fps tick before sampling (reference: src/video_server.cc:287-335) —
host decode and GPU work alternate.  foveax overlaps them: a background
thread decodes ahead into a bounded queue while the device processes the
current frame, and JAX's async dispatch keeps the device busy while the
host prepares the next upload.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

from foveax.pipeline.profiling import StageTimer


class PrefetchReader:
    """Wrap a frame source with a decode-ahead thread and bounded queue."""

    def __init__(self, reader, depth: int = 3):
        self._reader = reader
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: BaseException | None = None
        self._stop = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        try:
            while not self._stop:
                frame = self._reader.read()
                if frame is None:
                    break
                self._q.put(frame)
        except BaseException as e:  # surfaced on next read()
            self._err = e
        finally:
            self._q.put(self._done)

    def read(self) -> np.ndarray | None:
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            return None
        return item

    def close(self) -> None:
        """Stop the decode thread before the caller closes the underlying
        reader (a concurrent native read during release can crash)."""
        self._stop = True
        # Unblock a worker waiting on a full queue and drain to the
        # sentinel so the thread exits.
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                if not self._thread.is_alive():
                    break
                try:
                    item = self._q.get(timeout=5.0)
                except queue.Empty:
                    break
            if item is self._done:
                break
        self._thread.join(timeout=10.0)

    def __iter__(self):
        while (f := self.read()) is not None:
            yield f


def run_transcode(
    reader,
    process: Callable,
    gaze: Callable[[int], tuple[float, float]],
    sink: Callable[[np.ndarray, int], None],
    *,
    max_frames: int | None = None,
    timer: StageTimer | None = None,
) -> StageTimer:
    """Generic device transcode loop with prefetch + async dispatch.

    ``process(frame_jax, center_jax) -> device array`` must be a jitted
    function; ``sink(frame_np, idx)`` consumes outputs (encode/write).
    Device work for frame i overlaps host decode of i+1 and host encode of
    i-1 (the np.asarray sync happens one frame late).
    """
    import jax.numpy as jnp

    timer = timer or StageTimer()
    pf = PrefetchReader(reader)

    # Readback worker: device->host transfers and the sink run in a single
    # ordered thread, overlapping with the next frames' decode + device
    # compute.  (On remote-attached transports d2h is the slowest link;
    # serializing it with compute would gate the whole pipeline on it.)
    rq: queue.Queue = queue.Queue(maxsize=3)
    sink_err: list[BaseException] = []

    def drain():
        while True:
            item = rq.get()
            if item is None:
                return
            if sink_err:
                continue  # keep consuming so the producer never blocks
            dev_out, idx = item
            try:
                with timer.stage("d2h"):
                    host = np.asarray(dev_out)
                with timer.stage("sink"):
                    sink(host, idx)
            except BaseException as e:  # surfaced after the loop
                sink_err.append(e)

    worker = threading.Thread(target=drain, daemon=True)
    worker.start()

    try:
        n = 0
        for frame in pf:
            with timer.stage("h2d+dispatch"):
                fj = jnp.asarray(frame)
                c = jnp.asarray(gaze(n), dtype=jnp.float32)
                out = process(fj, c)
            rq.put((out, n))
            if sink_err:
                break
            n += 1
            if max_frames is not None and n >= max_frames:
                break
    finally:
        rq.put(None)
        worker.join()
        pf.close()
    if sink_err:
        raise sink_err[0]
    return timer
