"""Shared double-buffered DMA prologue for slab-windowed Pallas kernels.

All the fused kernels (segreduce sampler, unwarp_pl unwarp) follow the
same pipelining pattern: two slab slots + per-slot DMA semaphores, the
next linear grid step's window streaming in behind the current step's
dots.  This helper single-sources the slot/seed/prefetch/wait sequencing
so fixes land in every kernel at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def dbuf_slot(copy, t, n_total: int, active=None):
    """Run the double-buffer prologue for linear grid step ``t`` of
    ``n_total`` and return the slot index holding step t's data.

    ``copy(t2, slot)`` must return a ``pltpu.make_async_copy`` for step
    ``t2``'s window into slab slot ``slot`` (the caller decodes t2 into
    its own grid coordinates).  The prefetch index is clamped inside the
    guard so a hoisted/speculated SMEM read can never go out of bounds.

    ``active(t2)`` (optional, traced bool) gates step t2's DMA entirely
    — start AND wait are skipped under the same predicate, so a skipped
    step never waits on a never-started copy.  Callers use this to skip
    windows whose outputs are fully masked downstream (e.g. sampler
    blocks whose cells are all outside the frame at the current gaze).
    """
    slot = jax.lax.rem(t, 2)
    act = (lambda t2: True) if active is None else active

    @pl.when((t == 0) & act(t))
    def _():
        copy(t, slot).start()

    nxt = jnp.minimum(t + 1, n_total - 1)

    @pl.when((t + 1 < n_total) & act(nxt))
    def _():
        copy(nxt, 1 - slot).start()

    @pl.when(act(t))
    def _():
        copy(t, slot).wait()

    return slot
