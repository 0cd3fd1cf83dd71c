"""Per-stage latency accounting + optional device profiler traces.

The reference's observability is ad-hoc chrono spans accumulated per phase
and printed at exit (reference: src/video_client.h:68-73,
src/video_client.cc:375-383; server pacing checkpoint
src/video_server.cc:207-208,310-318).  foveax systematizes that: a
StageTimer collects per-stage counts/totals/maxima, and ``trace``
optionally wraps a region in a jax.profiler TraceAnnotation so device
timelines line up with host stages.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict


@dataclasses.dataclass
class StageStat:
    count: int = 0
    total_ms: float = 0.0
    max_ms: float = 0.0

    @property
    def avg_ms(self) -> float:
        return self.total_ms / self.count if self.count else 0.0


class StageTimer:
    def __init__(self, use_jax_profiler: bool = False):
        self.stats: dict[str, StageStat] = defaultdict(StageStat)
        self.use_jax_profiler = use_jax_profiler

    @contextlib.contextmanager
    def stage(self, name: str):
        ctx = contextlib.nullcontext()
        if self.use_jax_profiler:
            import jax.profiler

            ctx = jax.profiler.TraceAnnotation(name)
        t0 = time.perf_counter()
        with ctx:
            yield
        ms = (time.perf_counter() - t0) * 1e3
        s = self.stats[name]
        s.count += 1
        s.total_ms += ms
        s.max_ms = max(s.max_ms, ms)

    def report(self) -> str:
        lines = []
        for name in sorted(self.stats):
            s = self.stats[name]
            lines.append(
                f"{name}: n={s.count} avg={s.avg_ms:.2f}ms max={s.max_ms:.2f}ms"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            name: {"count": s.count, "avg_ms": s.avg_ms, "max_ms": s.max_ms}
            for name, s in self.stats.items()
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace for a region (viewable with
    tensorboard / xprof)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
