"""Fused SAT build + gaze-row selection: the streaming foveation kernel.

The box-filter sample needs exactly two SAT rows per output row (the box's
top and bottom edges, foveax/core/sample.py).  Building the full (3, H, W)
uint32 SAT in HBM (95 MB at 4K) only to gather ~2*Ho rows back out wastes
both the write and the re-read.  This kernel fuses the two: it scans row
blocks exactly like foveax.kernels.scan2d (MXU triangular-matmul row scan,
VMEM-carried column totals), but instead of writing the SAT it DMAs just
the *selected* rows — pyc[j] into sel_hi and pymc[j] into sel_lo — straight
from the freshly computed VMEM block to two (n_out, 4, W) outputs.

The gaze-dependent row indices arrive as scalar-prefetch operands (SMEM),
and because the log-rectilinear row map is monotone, two SMEM cursors walk
the sorted index lists once across the whole grid — every block advances
each cursor over the output rows whose source row falls inside the block.

Layout note: blocks are kept as (rows, 3, W) — image rows on the MAJOR
axis — because Mosaic only supports dynamic slicing for DMA on untiled
leading dimensions (a dynamic sublane slice of a (8,128)-tiled memref is
rejected).  The downstream sample consumes (n_out, 4, W) directly.

HBM traffic at 4K: read 24 MB (u8 frame) + write 2 x 17.8 MB (selected
rows) ~= 60 MB, vs ~215 MB for build-then-gather.

STATUS: experimental — correct on TPU (bit-exact vs build+gather at 4K)
but slower than the unfused pair on v5e: 3.25 ms with per-row DMAs,
2.90 ms with 8-row span-coalesced DMAs, vs ~2.2 ms for scan2d + XLA
gathers.  The residual cost is the serialized scalar emit loop (while +
cond per row) fighting the vector pipeline, plus the 4/3 channel padding
the rows-major layout requires.  Kept in-tree with interpret-mode tests;
the production pipeline uses foveax.kernels.scan2d + XLA gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foveax.kernels.scan2d import _LANE


def _make_kernel(block_rows: int, h: int, w: int, n_out: int):
    nblocks = h // block_rows

    def kernel(
        pyc_ref,  # (n_out,) int32 scalar-prefetch (SMEM)
        pymc_ref,  # (n_out,) int32 scalar-prefetch (SMEM)
        frame_ref,  # (block_rows, 4, w) u8 VMEM block
        sel_hi_ref,  # (n_out, 4, w) u32 in ANY/HBM
        sel_lo_ref,  # (n_out, 4, w) u32 in ANY/HBM
        sat_ref,  # VMEM scratch (block_rows, 4, w) u32
        carry_ref,  # VMEM scratch (1, 4, w) u32
        jhi_ref,  # SMEM scratch (1,) int32 cursor into pyc
        jlo_ref,  # SMEM scratch (1,) int32 cursor into pymc
        sem,  # DMA semaphore
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)
            jhi_ref[0] = 0
            jlo_ref[0] = 0

        blk = frame_ref[...]  # (r, 3, w) u8
        r, c, _ = blk.shape
        nch = w // _LANE

        x = blk.astype(jnp.int32).astype(jnp.float32).reshape(r * c, nch, _LANE)
        ks = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
        ls = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
        tri = (ks <= ls).astype(jnp.float32)
        local = jax.lax.dot_general(
            x, tri, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        totals = local[..., _LANE - 1]
        incl = totals
        shift = 1
        while shift < nch:
            incl = incl + jnp.pad(incl, ((0, 0), (shift, 0)))[:, :nch]
            shift *= 2
        excl = incl - totals
        rows = (
            (local + excl[..., None])
            .reshape(r, c, w)
            .astype(jnp.int32)
            .astype(jnp.uint32)
        )
        # Column scan along the (major) row axis.
        cols = rows
        shift = 1
        while shift < r:
            cols = cols + jnp.pad(cols, ((shift, 0), (0, 0), (0, 0)))[:r]
            shift *= 2
        sat_ref[...] = cols + carry_ref[...]
        carry_ref[...] = carry_ref[...] + cols[r - 1 :]

        # Emit selected rows whose source index lands in this block.
        r0 = i * block_rows
        r1 = r0 + block_rows

        span = 8  # static DMA chunk (DMA shapes must be static)

        def emit(idx_ref, cursor_ref, out_ref):
            def cond(j):
                # Clamp the read: `&` has no short-circuit, so j == n_out
                # would read past the scalar-prefetch buffer.
                return (j < n_out) & (idx_ref[jnp.minimum(j, n_out - 1)] < r1)

            def body(j):
                src = idx_ref[j] - r0

                # Span coalescing: in the fovea the row map has unit
                # stride, so runs of `span` consecutive (j, src) pairs are
                # common — copy them in one DMA.  All positions must be
                # checked (indices are only non-decreasing in general).
                run = (j + span <= n_out) & (src + span <= block_rows)
                for k in range(1, span):
                    # Clamped read: the predicate above already rejects
                    # out-of-range j+k, but the read must stay in bounds.
                    jk = jnp.minimum(j + k, n_out - 1)
                    run = run & (idx_ref[jk] - r0 == src + k)

                def copy_span(_):
                    cp = pltpu.make_async_copy(
                        sat_ref.at[pl.ds(src, span)],
                        out_ref.at[pl.ds(j, span)],
                        sem,
                    )
                    cp.start()
                    cp.wait()
                    return j + span

                def copy_one(_):
                    cp = pltpu.make_async_copy(
                        sat_ref.at[pl.ds(src, 1)],
                        out_ref.at[pl.ds(j, 1)],
                        sem,
                    )
                    cp.start()
                    cp.wait()
                    return j + 1

                return jax.lax.cond(run, copy_span, copy_one, None)

            cursor_ref[0] = jax.lax.while_loop(cond, body, cursor_ref[0])

        emit(pyc_ref, jhi_ref, sel_hi_ref)
        emit(pymc_ref, jlo_ref, sel_lo_ref)

    return kernel, nblocks


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def sat_select_rows(
    frame_rcw: jax.Array,
    pyc: jax.Array,
    pymc: jax.Array,
    *,
    block_rows: int | None = None,
    interpret: bool = False,
):
    """(H, 3, W) u8 frame + sorted row indices -> (sel_hi, sel_lo), each
    (n_out, 4, W) uint32 (4th channel zero): SAT rows pyc[j] / pymc[j] without materializing
    the SAT.  Indices must be ascending and in [0, H)."""
    h, c_in, w = frame_rcw.shape
    n_out = pyc.shape[0]
    if w % _LANE != 0:
        raise ValueError(f"width {w} not a multiple of {_LANE}")
    # Mosaic requires DMA slice shapes aligned to the sublane tiling (4 for
    # 32-bit): pad the channel axis 3 -> 4 (the consumer ignores channel 3).
    if c_in == 3:
        frame_rcw = jnp.pad(frame_rcw, ((0, 0), (0, 1), (0, 0)))
    if block_rows is None:
        block_rows = 32 if w <= 3840 else 16
    if h % block_rows != 0:
        block_rows = next(
            (b for b in (32, 16, 8, 4, 2, 1) if h % b == 0), 1
        )

    kernel, nblocks = _make_kernel(block_rows, h, w, n_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(
                (block_rows, 4, w),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows, 4, w), jnp.uint32),
            pltpu.VMEM((1, 4, w), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_out, 4, w), jnp.uint32),
            jax.ShapeDtypeStruct((n_out, 4, w), jnp.uint32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pyc, pymc, frame_rcw)
