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


def dbuf_slot(copy, t, n_total: int):
    """Run the double-buffer prologue for linear grid step ``t`` of
    ``n_total`` and return the slot index holding step t's data.

    ``copy(t2, slot)`` must return a ``pltpu.make_async_copy`` for step
    ``t2``'s window into slab slot ``slot`` (the caller decodes t2 into
    its own grid coordinates).  The prefetch index is clamped inside the
    guard so a hoisted/speculated SMEM read can never go out of bounds.
    """
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        copy(t, slot).start()

    @pl.when(t + 1 < n_total)
    def _():
        copy(jnp.minimum(t + 1, n_total - 1), 1 - slot).start()

    copy(t, slot).wait()
    return slot
