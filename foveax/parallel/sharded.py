"""Sharded pipeline steps via shard_map over a ("data", "space") mesh.

Design (SPMD, collectives on ICI):

1. **Sharded SAT build** — the 2-D inclusive prefix scan is the framework's
   sequence-parallel component.  The frame is sharded along image rows over
   the ``space`` axis.  Row scans (axis=x) are embarrassingly parallel.
   The column scan (axis=y) is a blocked scan: every device cumsums its own
   row block locally, then adds the sum of all *preceding* blocks — an
   exclusive prefix over per-block column totals, obtained with one
   ``all_gather`` of (1, W, 3)-sized totals over ICI and a masked sum.
   This mirrors the classic local-scan + carry-broadcast decomposition
   (the reference instead runs one serial scan per row/column on a single
   GPU, reference: src/sat_encoder_encode_kernels.cl:44-74).

2. **Multi-client step** — gazes are sharded over the ``data`` axis.  Each
   device needs the full SAT to sample its clients' gaze-dependent boxes, so
   the row-sharded SAT is all-gathered along ``space`` (pixels cross ICI
   exactly once per frame; gaze scalars are broadcast from host).  Sampling
   + unwarp then run vmapped per device with zero further communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from foveax.core.logrect import LogRectGrid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat
from foveax.core.unwarp import unwarp_rect


def _local_sat_block(frame_block: jax.Array) -> jax.Array:
    """Per-device partial SAT of a (3, h_local, W) row block, plus carry fix."""
    local = jnp.cumsum(frame_block, axis=2, dtype=jnp.uint32)
    local = jnp.cumsum(local, axis=1, dtype=jnp.uint32)

    # Exclusive prefix of per-block column totals across the `space` axis.
    totals = local[:, -1:, :]  # (3, 1, W): column sums of this block
    gathered = jax.lax.all_gather(totals, "space", axis=1, tiled=True)  # (3, n, W)
    idx = jax.lax.axis_index("space")
    n = jax.lax.axis_size("space")
    mask = (jnp.arange(n) < idx).astype(jnp.uint32)  # strictly preceding
    # Mask-multiply + integer sum, NOT einsum: a dot_general contraction
    # may lower through the MXU, whose float operand truncation would
    # corrupt uint32 SAT totals (> 2^24 at 1080p+; mod-2^32 wrap load-
    # bearing at 16K).  The VPU multiply/reduce stays exact.
    carry = (gathered.astype(jnp.uint32) * mask[None, :, None]).sum(
        axis=1, dtype=jnp.uint32
    )
    return local + carry[:, None, :]


def sharded_build_sat(frame: jax.Array, mesh: Mesh) -> jax.Array:
    """(H, W, 3) uint8 -> (3, H, W) uint32 SAT, row-sharded over ``space``.

    H must divide evenly by the mesh's space size.
    """
    fn = shard_map(
        lambda f: _local_sat_block(f.astype(jnp.uint32).transpose(2, 0, 1)),
        mesh=mesh,
        in_specs=P("space", None, None),
        out_specs=P(None, "space", None),
    )
    return fn(frame)


def multi_client_step(
    frame: jax.Array,
    centers: jax.Array,
    grid: LogRectGrid,
    mesh: Mesh,
    *,
    unwarp: bool = True,
):
    """Full sharded serving step: one frame, a batch of client gazes.

    ``frame``: (H, W, 3) uint8 — sharded by rows over ``space``.
    ``centers``: (N, 2) float32 — sharded over ``data``; N must divide by
    the data-axis size.

    Returns the per-client reduced frames (N, Hr, Wr, 3) and, if ``unwarp``,
    the per-client restored frames (N, H, W, 3), both sharded over ``data``.
    """
    sh, sw = frame.shape[0], frame.shape[1]

    def step(frame_block, centers_block):
        # frame_block: (h_local, W, 3) on each space shard (replicated over
        # data); centers_block: (n_local, 2) on each data shard.
        partial = _local_sat_block(
            frame_block.astype(jnp.uint32).transpose(2, 0, 1)
        )
        sat = jax.lax.all_gather(partial, "space", axis=1, tiled=True)

        def per_client(c):
            reduced = sample_rect_from_sat(sat, grid, c)
            if unwarp:
                return reduced, unwarp_rect(reduced, sw, sh, c)
            return (reduced,)

        return jax.vmap(per_client)(centers_block)

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P("space", None, None), P("data", None)),
        out_specs=P("data"),
        # Outputs are replicated over `space` (every space shard holds the
        # full gathered SAT and the same client block) — the static VMA
        # analysis cannot prove that, so disable the check.
        check_vma=False,
    )
    return fn(frame, centers)


def frame_parallel_roundtrip(
    frames: jax.Array,
    centers: jax.Array,
    grid: LogRectGrid,
    mesh: Mesh,
):
    """Offline transcode parallelism: a batch of frames sharded across ALL
    mesh devices, each foveated + unwarped with its own gaze — the
    embarrassingly parallel axis for gaze-trace transcodes on a pod.

    ``frames``: (B, H, W, 3) uint8, B divisible by the mesh device count.
    Returns (B, Hr, Wr, 3) reduced and (B, H, W, 3) restored frames.
    """
    _, sh, sw, _ = frames.shape
    spec = P(("data", "space"))

    def per_frame(frame, center):
        sat = build_sat(frame)
        reduced = sample_rect_from_sat(sat, grid, center)
        return reduced, unwarp_rect(reduced, sw, sh, center)

    fn = shard_map(
        lambda f, c: jax.vmap(per_frame)(f, c),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )
    return fn(frames, centers)


def jit_multi_client_step(grid: LogRectGrid, mesh: Mesh, *, unwarp: bool = True):
    """Compiled closure over (grid, mesh) for the serving hot loop."""

    @functools.partial(jax.jit, static_argnames=())
    def fn(frame, centers):
        return multi_client_step(frame, centers, grid, mesh, unwarp=unwarp)

    return fn


def sharded_sample_batch(
    sat: jax.Array, centers: jax.Array, grid: LogRectGrid, mesh: Mesh
) -> jax.Array:
    """Gaze-late half of the sharded serving step: sample a batch of
    client gazes from a row-sharded SAT.

    ``sat``: (3, H, W) uint32 row-sharded over ``space`` (the output of
    :func:`sharded_build_sat`).  ``centers``: (N, 2) float32, N divisible
    by the data-axis size.  Each data shard all-gathers the SAT rows over
    ``space`` (pixels cross ICI once per tick) and samples its clients
    with zero further communication.  Returns (N, Hr, Wr, 3) uint8
    sharded over ``data``.

    Split from the SAT build so the serving loop keeps the reference's
    build-eager / gaze-late structure (src/video_server.cc:302-328)
    across the tick boundary.
    """

    def step(sat_block, centers_block):
        full = jax.lax.all_gather(sat_block, "space", axis=1, tiled=True)
        return jax.vmap(
            lambda c: sample_rect_from_sat(full, grid, c)
        )(centers_block)

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(None, "space", None), P("data", None)),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(sat, centers)


def sharded_sample_batch_fused(
    frame: jax.Array,
    centers: jax.Array,
    grid: LogRectGrid,
    mesh: Mesh,
    *,
    wrap_x: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """Gaze-batched SAT-free fused sampling sharded over ``data``: the
    round-4 knee path (fused batch — the measured 240-clients-per-chip
    30 fps tick, BENCHMARKS.md) scaled across chips.

    ``frame``: (H, W, 3) uint8, replicated — it crosses ICI once at
    placement, NOT per tick (contrast :func:`sharded_sample_batch`,
    whose all-gather moves the 4x-larger u32 SAT every tick).
    ``centers``: (N, 2) f32 sharded over ``data``; each shard runs the
    fused segment-reduce batch on its local gazes with zero per-tick
    communication — multi-chip serving is embarrassingly data-parallel
    once the sampler needs no SAT.  Returns (N, Hr, Wr, 3) uint8 sharded
    over ``data``.  The shape must satisfy the fused kernels' structural
    contract (:func:`foveax.kernels.segreduce.fused_eligible`); the
    serve-loop autos degrade to the SAT pair otherwise.

    (The reference serves one engine stack per connection on one GPU,
    reference: src/video_server.cc:62-85 — no multi-device analog.)
    """
    from foveax.kernels.segreduce import sample_rect_fused_batch

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def step(frame_rep, centers_block):
        return sample_rect_fused_batch(
            frame_rep.transpose(2, 0, 1),
            grid,
            centers_block,
            wrap_x=wrap_x,
            in_layout="chw",
            interpret=interpret,
        )

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(None, None, None), P("data", None)),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(frame, centers)


def jit_serve_parts(grid: LogRectGrid, mesh: Mesh):
    """(build_fn, sample_fn) compiled closures for the sharded broadcast
    serving loop: ``build_fn(frame)`` -> row-sharded SAT (pre-tick,
    eager), ``sample_fn(sat, centers)`` -> per-client reduced frames
    (post-tick, gaze-late)."""
    build = jax.jit(lambda f: sharded_build_sat(f, mesh))
    sample = jax.jit(
        lambda sat, centers: sharded_sample_batch(sat, centers, grid, mesh)
    )
    return build, sample


def jit_serve_parts_fused(
    grid: LogRectGrid, mesh: Mesh, *, wrap_x: bool = True
):
    """SAT-free (prepare_fn, sample_fn) for the sharded broadcast loop:
    ``prepare_fn(frame)`` replicates the frame over the mesh — the fused
    path's once-per-frame ICI cost, paid gaze-early so the gaze-late
    half is collective-free — and ``sample_fn(frame, centers)`` runs the
    data-parallel fused batch (:func:`sharded_sample_batch_fused`).
    Same (prepare, sample) calling shape as :func:`jit_serve_parts`, so
    the serve loop swaps pairs without branching per tick."""
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P(None, None, None))
    prepare = jax.jit(lambda f: f, out_shardings=rep)
    sample = jax.jit(
        lambda f, centers: sharded_sample_batch_fused(
            f, centers, grid, mesh, wrap_x=wrap_x
        )
    )
    return prepare, sample
