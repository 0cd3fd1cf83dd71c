"""Pure-stream HBM microbenchmark: what does THIS chip actually deliver?

Every roofline argument in BENCHMARKS.md leans on stream rates inferred
from production kernels (read-dominated ~300 GB/s, the SAT's write
pattern ~133 GB/s).  This pins the ceiling directly with minimal Pallas
kernels that do nothing but move bytes:

  read     — stream the array HBM->VMEM, reduce to one tile (write ~0)
  write    — stream a constant VMEM tile ->HBM (read ~0)
  copy     — 1:1 read:write passthrough
  expand4  — read u8, write u32 (1:4 read:write — the SAT build's exact
             byte ratio, reference: src/sat_encoder_encode_kernels.cl:44-74)

each at u8 and u32 (where meaningful) across a block-rows geometry sweep.
Arrays are created ON DEVICE (an upload through this environment's relay
would take minutes); timing is a dependency-chained `lax.fori_loop` whose
carry perturbs one element per iteration, ended by a scalar readback —
`block_until_ready` is not a reliable fence through the relay (CLAUDE.md).

Output: one line per (mode, dtype, block_rows) with GB/s moved
(read+write bytes summed), plus a MAX row per mode.  Run fresh-process in
the same window as `stage_bench.py` so stage %-of-delivered is meaningful.

Usage: python scripts/hbm_stream_bench.py [--iters 8] [--mb 128]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

_LANE = 128
_W = 4096  # static row width (32 lane tiles): contiguous whole-row DMAs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mb", type=int, default=128, help="u8 array MB (u32 uses mb/2 rows x4 bytes)")
    ap.add_argument(
        "--modes", nargs="*", default=["read", "write", "copy", "expand4"],
        choices=["read", "write", "copy", "expand4"],
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h_u8 = args.mb * (1 << 20) // _W
    h_u32 = h_u8 // 2  # u32 array = mb/2 rows -> 2x mb bytes

    def read_kernel(x_ref, o_ref):
        # Mosaic has no unsigned reductions; sum in int32 (mod-2^32 bits
        # match) and bit-convert into the u32 output.
        s = jnp.sum(x_ref[...].astype(jnp.int32))
        o_ref[...] = (jnp.zeros(o_ref.shape, jnp.int32) + s).astype(jnp.uint32)

    def write_kernel(t_ref, o_ref):
        # Scalar extract must be 32-bit on Mosaic; reduce the tile instead.
        s = jnp.max(t_ref[...].astype(jnp.int32))
        o_ref[...] = (jnp.zeros(o_ref.shape, jnp.int32) + s).astype(o_ref.dtype)

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def expand4_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.int32).astype(jnp.uint32)

    @functools.partial(
        jax.jit, static_argnames=("mode", "dtype_name", "block_rows", "h")
    )
    def step(x, mode, dtype_name, block_rows, h):
        dt = jnp.uint8 if dtype_name == "u8" else jnp.uint32
        grid = h // block_rows
        if mode == "read":
            return pl.pallas_call(
                read_kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec((block_rows, _W), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((1, 8, _LANE), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((grid, 8, _LANE), jnp.uint32),
            )(x)
        if mode == "write":
            return pl.pallas_call(
                write_kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec((8, _LANE), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((block_rows, _W), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((h, _W), dt),
            )(x)
        kern = copy_kernel if mode == "copy" else expand4_kernel
        out_dt = dt if mode == "copy" else jnp.uint32
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec((block_rows, _W), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block_rows, _W), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((h, _W), out_dt),
        )(x)

    @functools.partial(
        jax.jit, static_argnames=("mode", "dtype_name", "block_rows", "h", "iters")
    )
    def loop(x, mode, dtype_name, block_rows, h, iters):
        def body(i, carry):
            x, acc = carry
            out = step(x, mode, dtype_name, block_rows, h)
            probe = out.reshape(-1)[0].astype(jnp.uint32)
            # Value-dependence back into the next iteration's input: not
            # foldable, one dynamic-update-slice per iter (in-place in the
            # loop carry).
            upd = (x.reshape(-1)[0] ^ (probe & 1).astype(x.dtype)).reshape(1)
            x = jax.lax.dynamic_update_slice(
                x, upd.reshape(1, 1).astype(x.dtype), (0, 0)
            )
            return x, acc + probe
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.uint32(0)))
        return acc

    def make(dtype_name, mode):
        dt = jnp.uint8 if dtype_name == "u8" else jnp.uint32
        if mode == "write":  # input is one tile; the OUTPUT is the stream
            return jax.jit(
                lambda: (jnp.arange(8 * _LANE, dtype=jnp.uint32).reshape(8, _LANE)
                         & 0xFF).astype(dt)
            )()
        h = h_u8 if dtype_name == "u8" else h_u32
        return jax.jit(
            lambda: (
                jax.lax.broadcasted_iota(jnp.uint32, (h, _W), 1)
                + jax.lax.broadcasted_iota(jnp.uint32, (h, _W), 0)
            ).astype(dt)
        )()

    def bytes_moved(mode, dtype_name):
        esz = 1 if dtype_name == "u8" else 4
        h = h_u8 if dtype_name == "u8" else h_u32
        n = h * _W * esz
        if mode == "read":
            return n
        if mode == "write":
            return n
        if mode == "copy":
            return 2 * n
        return h * _W * (1 + 4)  # expand4: u8 in, u32 out

    # (mode, dtype) -> block-rows sweep kept inside the 16 MB scoped-VMEM
    # budget with double buffering (copy holds in+out blocks x2).
    sweeps = {
        ("read", "u8"): (32, 128, 512, 1024),
        ("read", "u32"): (8, 64, 256),
        ("write", "u8"): (32, 128, 512, 1024),
        ("write", "u32"): (8, 64, 256),
        ("copy", "u8"): (32, 128, 512),
        ("copy", "u32"): (8, 32, 128),
        ("expand4", "u8"): (32, 128, 256),
    }

    results = {}
    for (mode, dtype_name), rows_sweep in sweeps.items():
        if mode not in args.modes:
            continue
        x = make(dtype_name, mode)
        h = h_u8 if dtype_name == "u8" else h_u32
        nbytes = bytes_moved(mode, dtype_name)
        for rows in rows_sweep:
            if h % rows:
                continue
            fn1 = functools.partial(
                loop, mode=mode, dtype_name=dtype_name, block_rows=rows,
                h=h, iters=args.iters,
            )
            fn2 = functools.partial(
                loop, mode=mode, dtype_name=dtype_name, block_rows=rows,
                h=h, iters=2 * args.iters,
            )
            print(f"# compiling {mode}/{dtype_name}/rows={rows}", flush=True)
            fn1(x)
            fn2(x)  # compile + warm both
            # Median-of-3 paired-difference timing: the relay's per-call
            # readback floor (~30 ms) would otherwise swamp the kernels;
            # (t_2N - t_N)/N cancels every per-call fixed cost.
            diffs = []
            for _ in range(3):
                t0 = time.perf_counter()
                int(fn1(x))
                t1 = time.perf_counter()
                int(fn2(x))
                t2 = time.perf_counter()
                diffs.append((t2 - t1) - (t1 - t0))
            t = sorted(diffs)[1] / args.iters
            if t <= 0:  # relay jitter exceeded the signal; flag, don't div0
                print(f"{mode:8s} {dtype_name:4s} rows={rows:5d}  UNSTABLE")
                continue
            gbs = nbytes / t / 1e9
            results.setdefault((mode, dtype_name), []).append((rows, gbs))
            print(
                f"{mode:8s} {dtype_name:4s} rows={rows:5d}  "
                f"{nbytes / 1e6:7.1f} MB/iter  {t * 1e3:7.2f} ms  "
                f"{gbs:7.1f} GB/s",
                flush=True,
            )
    print("---")
    for (mode, dtype_name), rows_gbs in sorted(results.items()):
        rows, gbs = max(rows_gbs, key=lambda rg: rg[1])
        print(f"MAX {mode:8s} {dtype_name:4s} {gbs:7.1f} GB/s (rows={rows})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
