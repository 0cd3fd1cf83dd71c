"""Prefetch runner + profiling."""

import numpy as np

import jax.numpy as jnp

from foveax.config import FoveaxConfig
from foveax.io.video import SyntheticReader
from foveax.pipeline.frames import FoveationPipeline
from foveax.pipeline.profiling import StageTimer
from foveax.pipeline.runner import PrefetchReader, run_transcode


def test_prefetch_preserves_order_and_count():
    r = PrefetchReader(SyntheticReader(32, 16, n_frames=20), depth=2)
    direct = list(SyntheticReader(32, 16, n_frames=20))
    got = list(r)
    assert len(got) == 20
    for a, b in zip(got, direct):
        np.testing.assert_array_equal(a, b)


def test_prefetch_propagates_errors():
    class Bad:
        def __init__(self):
            self.n = 0

        def read(self):
            self.n += 1
            if self.n > 3:
                raise RuntimeError("decoder exploded")
            return np.zeros((4, 4, 3), np.uint8)

    r = PrefetchReader(Bad(), depth=1)
    got = 0
    try:
        while r.read() is not None:
            got += 1
        raised = False
    except RuntimeError:
        raised = True
    assert raised and got == 3


def test_run_transcode_overlap_correctness():
    cfg = FoveaxConfig(
        source_width=96, source_height=64, reduced_width=48, reduced_height=32
    )
    p = FoveationPipeline(cfg)
    outs = {}
    timer = run_transcode(
        SyntheticReader(96, 64, n_frames=7),
        p.foveate,
        lambda i: (0.5, 0.5),
        lambda frame, i: outs.__setitem__(i, frame),
        timer=StageTimer(),
    )
    assert sorted(outs) == list(range(7))
    # Results identical to the non-overlapped path.
    src = SyntheticReader(96, 64, n_frames=7)
    for i, frame in enumerate(src):
        ref = np.asarray(p.foveate(jnp.asarray(frame), p.center(0.5, 0.5)))
        np.testing.assert_array_equal(outs[i], ref)
    d = timer.as_dict()
    assert d["h2d+dispatch"]["count"] == 7
    assert d["sink"]["count"] == 7
    assert timer.report()


def test_stage_timer_max_and_avg():
    import time

    t = StageTimer()
    for dur in (0.001, 0.003):
        with t.stage("x"):
            time.sleep(dur)
    s = t.stats["x"]
    assert s.count == 2
    assert s.max_ms >= s.avg_ms > 0


def test_run_transcode_sink_failure_raises_not_hangs():
    """A failing sink must surface its error instead of deadlocking the
    producer on the bounded readback queue."""
    cfg = FoveaxConfig(
        source_width=96, source_height=64, reduced_width=48, reduced_height=32
    )
    p = FoveationPipeline(cfg)

    def bad_sink(frame, i):
        raise IOError("disk full")

    import pytest

    with pytest.raises(IOError):
        run_transcode(
            SyntheticReader(96, 64, n_frames=30),
            p.foveate,
            lambda i: (0.5, 0.5),
            bad_sink,
        )


def test_prefetch_close_mid_stream():
    r = PrefetchReader(SyntheticReader(32, 16, n_frames=500), depth=2)
    assert r.read() is not None
    r.close()  # must not hang or crash with frames still queued
