"""Blocked 2-D inclusive prefix scan (SAT build) as a single Pallas kernel.

The reference builds the SAT with one serial pass per row then per column
(one work-item each, reference: src/sat_encoder_encode_kernels.cl:44-74),
i.e. O(W)-deep serial chains.  XLA's `cumsum` pair does two full HBM round
trips (write 4x-expanded u32 SAT, re-read, re-write).  This kernel does the
whole SAT in ONE pass — read the u8 image once, write the u32 SAT once —
by exploiting that a TPU Pallas grid executes *sequentially* on the core:
it walks row blocks top to bottom and carries the running column totals
across grid steps in a VMEM scratch accumulator.

In-block scan strategy (TPU-shaped):
  * Row scan (lane axis): chunked *triangular matmul* on the MXU.  Each
    128-lane chunk is multiplied by a constant 128x128 lower-triangular
    ones matrix; chunk offsets are a short log-scan over the ~W/128 chunk
    totals.  Exactness: inputs are uint8, so every f32 partial sum is
    <= 255*3840 < 2^24 — exactly representable; the result converts to
    uint32 losslessly.  (Lane-wise shift scans are slow on TPU — shifting
    across lanes costs permutes; the MXU does the same reduction tree at
    matmul speed.)
  * Column scan (sublane axis): log-step shifted adds in uint32 (sublane
    shifts are cheap) + the cross-block scratch carry, preserving the
    mod-2^32 wraparound semantics of the reference SAT.

The same local-scan + carry structure extends across chips (see
foveax.parallel.sharded) — this kernel is the single-chip leg of that
decomposition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _log_scan_sublanes(x: jax.Array, rows: int) -> jax.Array:
    """Inclusive Hillis-Steele scan along axis 1 of a (C, R, W) block."""
    shift = 1
    while shift < rows:
        x = x + jnp.pad(x, ((0, 0), (shift, 0), (0, 0)))[:, :rows, :]
        shift *= 2
    return x


def _sat_kernel(frame_ref, out_ref, carry_ref, *, int8: bool = False):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    blk = frame_ref[...]  # (3, R, W) uint8
    c, r, w = blk.shape
    nch = w // _LANE

    # 128x128 lower-triangular ones: L[k, l] = (k <= l).
    ks = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    ls = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)

    if int8:
        # MXU int8 path (FOVEAX_SCAN_INT8, round-5 ceiling work — same
        # scheme as the fused families' one-hot dots, segreduce.py): u8
        # pixels shift to x-128 via a sign-bit XOR so they fit s8, the
        # triangular scan runs as an s8 dot with exact s32 accumulation
        # (measured 310 TOP/s vs 183 TF bf16), and the shift is undone
        # by the CONSTANT per-lane correction 128*(l+1) — the inclusive
        # scan of the constant 128.  Exact integers end to end; also
        # drops the u8->i32->f32 conversion planes (Mosaic materializes
        # those full-size).
        xs8 = (blk ^ jnp.uint8(128)).astype(jnp.int8).reshape(
            c * r, nch, _LANE
        )
        tri8 = (ks <= ls).astype(jnp.int8)
        local_raw = jax.lax.dot_general(
            xs8,
            tri8,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (c*r, nch, 128): scan of (x - 128) within each chunk
        lane_fix = 128 * (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, _LANE), 2) + 1
        )
        local_i = local_raw + lane_fix  # exact inclusive scan of x
        # Chunk-offset scan stays on the f32 limb matmul (totals exceed
        # s8 range; the two tiny strict-tri matmuls are ~free).
        totals = local_i[..., _LANE - 1].astype(jnp.float32)
    else:
        # Mosaic has no direct u8->f32 cast; hop through int32.
        x = blk.astype(jnp.int32).astype(jnp.float32).reshape(
            c * r, nch, _LANE
        )
        tri = (ks <= ls).astype(jnp.float32)

        local = jax.lax.dot_general(
            x,
            tri,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (c*r, nch, 128): inclusive scan within each chunk

        totals = local[..., _LANE - 1]  # (c*r, nch) chunk sums
    # Exclusive chunk-offset scan as ONE strict-lower-triangular matmul.
    # Chunk totals reach 255*128 = 32640, beyond bf16's exact-integer range
    # (and the MXU truncates f32 operands to bf16), so split totals =
    # hi*128 + lo with both factors <= 255 (bf16-exact); the MXU
    # accumulates in f32, exact below 2^24 (max sum 60*32640 ~ 2*10^6).
    # A log-step pad/shift scan here measured 4.7 ms/frame at 8K — tiny
    # data, but Mosaic lowers the lane-axis pads terribly; the two 60x60
    # matmuls are ~free next to the main chunk-scan matmul.
    t_hi = jnp.floor(totals * (1.0 / _LANE))
    t_lo = totals - t_hi * _LANE
    ks2 = jax.lax.broadcasted_iota(jnp.int32, (nch, nch), 0)
    ls2 = jax.lax.broadcasted_iota(jnp.int32, (nch, nch), 1)
    stri = (ks2 < ls2).astype(jnp.float32)

    def _mm(t):
        return jax.lax.dot_general(
            t,
            stri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    excl = _mm(t_hi) * _LANE + _mm(t_lo)
    if int8:
        # local is already exact i32; only the (small) excl plane casts.
        rows = (
            (local_i + excl.astype(jnp.int32)[..., None])
            .reshape(c, r, w)
            .astype(jnp.uint32)
        )
    else:
        # f32 -> u32 also needs an int32 hop in Mosaic (values < 2^24).
        rows = (
            (local + excl[..., None])
            .reshape(c, r, w)
            .astype(jnp.int32)
            .astype(jnp.uint32)
        )

    cols = _log_scan_sublanes(rows, r)
    out_ref[...] = cols + carry_ref[...]
    carry_ref[...] = carry_ref[...] + cols[:, r - 1 :, :]


@functools.partial(
    jax.jit, static_argnames=("block_rows", "interpret", "in_layout")
)
def build_sat_pallas(
    frame: jax.Array,
    *,
    block_rows: int | None = None,
    interpret: bool = False,
    in_layout: str = "hwc",
) -> jax.Array:
    """(H, W, 3) uint8 (or (3, H, W) with in_layout="chw") -> (3, H, W)
    uint32 SAT.  Bit-identical to foveax.core.sat.build_sat (uint32
    wraparound included).

    Requires W % 128 == 0 (every standard video width); callers should use
    foveax.core.sat.build_sat for odd sizes.
    """
    if in_layout == "chw":
        _, h, w = frame.shape
    else:
        h, w, _ = frame.shape
    if w % _LANE != 0:
        raise ValueError(f"width {w} not a multiple of {_LANE}")
    if block_rows is None:
        # VMEM budget: the block plus scan temporaries must fit the 16 MB
        # scoped limit.  Empirically verified safe: 32 rows at <=4K widths,
        # 16 rows at 8K (32 OOMs there); larger/odd block sizes tripped the
        # scoped limit in non-obvious ways, so stay with powers of two.
        block_rows = 32 if w <= 3840 else 16
    if h % block_rows != 0 or block_rows % 8 != 0:
        # Mosaic needs the sublane block divisible by 8 (or equal to the
        # full dimension); pick the largest power-of-two divisor of h
        # within the budget.
        block_rows = next(
            (b for b in (32, 16, 8) if b <= block_rows and h % b == 0),
            None,
        )
        if block_rows is None:
            raise ValueError(
                f"height {h} has no 8-multiple row-block divisor; use "
                "foveax.core.sat.build_sat"
            )
    planes = frame if in_layout == "chw" else frame.transpose(2, 0, 1)

    # Read at TRACE time (like the fused families' knobs): an A/B
    # process sets the env before its first call; a live flip needs a
    # fresh traced function.
    import os

    int8 = os.environ.get("FOVEAX_SCAN_INT8", "0") == "1"
    grid = (h // block_rows,)
    return pl.pallas_call(
        functools.partial(_sat_kernel, int8=int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3, block_rows, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (3, block_rows, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((3, 1, w), jnp.uint32)],
        interpret=interpret,
    )(planes)
