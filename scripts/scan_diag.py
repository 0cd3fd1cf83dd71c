"""SAT scan kernel decomposition: where do its 16K milliseconds go?

Round 5's delivered-ceiling measurements showed the scan's measured
throughput (~133 GB/s effective at 16K) sits far below the chip's
delivered 625+ GB/s for the exact u8-read/u32-write expand pattern —
so the kernel is NOT DMA-floored.  This harness splits the kernel's
per-block budget into its compute pieces by timing surgically reduced
variants of the same pallas_call (same grid, same block specs, same
DMA traffic unless noted):

  full     production kernel (row MXU scan + chunk offsets + column
           log-scan + cross-block carry)
  nocol    row scan only — column log-scan + carry replaced by a cast
           (isolates the VPU column-scan + carry cost)
  nodot    no MXU row scan — casts + column scan + carry only
           (isolates the triangular-matmul cost)
  floor    cast-and-write only (u8 -> u32): the kernel-shaped analog of
           the expand4 stream microbench — DMA + cast floor
  rows=N   full kernel at alternative row-block sizes (VMEM permitting)

full - nocol ~= column scan; full - nodot ~= dots; floor ~= bytes.
Variants are NOT bit-correct SATs (that's build_sat_pallas's suite);
they exist only to attribute time.

Usage: python scripts/scan_diag.py [--res 16k] [--iters 10]
reference: the SAT build this decomposes is
src/sat_encoder_encode_kernels.cl:44-74's serial-chain design, rebuilt
as foveax/kernels/scan2d.py.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

RES = {"4k": (3840, 2160), "8k": (7680, 4320), "16k": (15360, 8640)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="16k", choices=RES)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--interpret", action="store_true",
        help="CPU interpret-mode smoke (tiny geometry, no timing value)",
    )
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from foveax.kernels.scan2d import _LANE, _log_scan_sublanes

    w, h = (256, 32) if args.interpret else RES[args.res]

    def variant_kernel(frame_ref, out_ref, carry_ref, *, mode: str):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        blk = frame_ref[...]
        c, r, wv = blk.shape
        nch = wv // _LANE
        xi = blk.astype(jnp.int32)
        if mode == "floor":
            out_ref[...] = xi.astype(jnp.uint32)
            return
        if mode == "nodot":
            rows = xi.astype(jnp.uint32)
        else:
            x = xi.astype(jnp.float32).reshape(c * r, nch, _LANE)
            ks = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
            ls = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
            tri = (ks <= ls).astype(jnp.float32)
            local = jax.lax.dot_general(
                x, tri,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            totals = local[..., _LANE - 1]
            t_hi = jnp.floor(totals * (1.0 / _LANE))
            t_lo = totals - t_hi * _LANE
            ks2 = jax.lax.broadcasted_iota(jnp.int32, (nch, nch), 0)
            ls2 = jax.lax.broadcasted_iota(jnp.int32, (nch, nch), 1)
            stri = (ks2 < ls2).astype(jnp.float32)

            def _mm(t):
                return jax.lax.dot_general(
                    t, stri,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            excl = _mm(t_hi) * _LANE + _mm(t_lo)
            rows = (
                (local + excl[..., None])
                .reshape(c, r, wv)
                .astype(jnp.int32)
                .astype(jnp.uint32)
            )
        if mode == "nocol":
            out_ref[...] = rows
            return
        cols = _log_scan_sublanes(rows, r)
        out_ref[...] = cols + carry_ref[...]
        carry_ref[...] = carry_ref[...] + cols[:, r - 1 :, :]

    def build(mode: str, block_rows: int):
        if h % block_rows or w % _LANE:
            raise ValueError("geometry")
        kern = functools.partial(variant_kernel, mode=mode)

        @jax.jit
        def scan(planes):
            return pl.pallas_call(
                kern,
                grid=(h // block_rows,),
                in_specs=[
                    pl.BlockSpec(
                        (3, block_rows, w), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (3, block_rows, w), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint32),
                scratch_shapes=[pltpu.VMEM((3, 1, w), jnp.uint32)],
                interpret=args.interpret,
            )(planes)

        return scan

    frame = jax.jit(
        lambda: (
            jax.lax.broadcasted_iota(jnp.int32, (3, h, w), 2)
            + jax.lax.broadcasted_iota(jnp.int32, (3, h, w), 1)
        ).astype(jnp.uint8)
    )()

    def timed(name: str, scan):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(fr, iters):
            def body(i, carry):
                fr, acc = carry
                out = scan(fr)
                probe = out[0, 0, 0].astype(jnp.float32)
                upd = fr[0:1, 0:1, 0:1] ^ (
                    probe.astype(jnp.int32) & 1
                ).astype(jnp.uint8)
                fr = jax.lax.dynamic_update_slice(fr, upd, (0, 0, 0))
                return fr, acc + probe

            # NB: must loop over the ARGUMENT fr, not the outer frame —
            # closing over the concrete array embeds ~400 MB of constant
            # into the HLO and the remote compiler rejects it (HTTP 413,
            # observed 2026-08-21 04:43Z).
            _, acc = jax.lax.fori_loop(0, iters, body, (fr, jnp.float32(0)))
            return acc

        n1 = args.iters
        f1 = functools.partial(loop, iters=n1)
        f2 = functools.partial(loop, iters=2 * n1)
        print(f"# compiling {name}", flush=True)
        try:
            float(f1(frame))
            float(f2(frame))
        except Exception as e:
            print(f"scan:{args.res} {name:10s} FAILED {e!r}"[:160], flush=True)
            return
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f1(frame))
            t1 = time.perf_counter()
            float(f2(frame))
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / n1)
        t = sorted(diffs)[1]
        print(f"scan:{args.res} {name:10s} {t * 1e3:7.2f} ms/frame", flush=True)

    base_rows = 8 if args.interpret else (32 if w <= 3840 else 16)
    for mode in ("full", "nocol", "nodot", "floor"):
        timed(mode, build(mode, base_rows))
    for rows in (8, 32, 64):
        if rows != base_rows and h % rows == 0:
            timed(f"rows={rows}", build("full", rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
