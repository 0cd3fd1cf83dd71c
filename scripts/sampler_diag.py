"""Per-pass timing of the fused segment-reduce sampler at a given shape.

The 16K fused sampler measures ~4.7 ms against a ~1 ms byte floor at
the chip's delivered rates (hbm_stream_bench.py) — this splits the
stage into its two Pallas passes with dependency-chained
paired-difference loops:

  full   sample_rect_fused (y + x, the production stage)
  ypass  y_segment_reduce alone (row reduction -> u16 partials)

x-pass cost ~= full - ypass (the orchestration between them is trivial).

Usage: python scripts/sampler_diag.py [--res 16k] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

RES = {"1080p": (1920, 1080), "4k": (3840, 2160), "8k": (7680, 4320),
       "16k": (15360, 8640)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="16k", choices=RES)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foveax.config import reduced_dim
    from foveax.core.logrect import make_grid
    from foveax.core.sample import _axis_taps
    from foveax.kernels.segreduce import sample_rect_fused, y_segment_reduce

    ws, hs = RES[args.res]
    rw, rh = reduced_dim(ws), reduced_dim(hs)
    grid = make_grid(rw, rh, ws, hs)
    gy = np.asarray(grid.gy, dtype=np.int64)

    frame = jax.jit(
        lambda: (
            jax.lax.broadcasted_iota(jnp.int32, (3, hs, ws), 2)
            + jax.lax.broadcasted_iota(jnp.int32, (3, hs, ws), 1)
        ).astype(jnp.uint8)
    )()

    def chain(step):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(frame, iters):
            def body(i, carry):
                frame, acc = carry
                c = jnp.asarray([0.3, 0.5], jnp.float32) + acc * jnp.float32(1e-30)
                probe = step(frame, c)
                upd = frame[0:1, 0:1, 0:1] ^ (
                    probe.astype(jnp.int32) & 1
                ).astype(jnp.uint8)
                frame = jax.lax.dynamic_update_slice(frame, upd, (0, 0, 0))
                return frame, acc + probe.astype(jnp.float32)

            _, acc = jax.lax.fori_loop(0, iters, body, (frame, jnp.float32(0)))
            return acc
        return loop

    def full_step(frame, c):
        out = sample_rect_fused(frame, grid, c, out_layout="chw")
        return out[0, 0, 0]

    def y_step(frame, c):
        cy = (c[1] * jnp.float32(hs)).astype(jnp.int32)
        pyc, pymc, valid_y, _, _ = _axis_taps(grid.gy, cy, hs, wrap=False)
        rows = y_segment_reduce(frame, pymc + 1, pyc + 1, gy, valid=valid_y)
        return rows[0, 0, 0]

    for name, step in (("full", full_step), ("ypass", y_step)):
        loop = chain(step)
        n1, n2 = args.iters, 2 * args.iters
        f1 = functools.partial(loop, iters=n1)
        f2 = functools.partial(loop, iters=n2)
        print(f"# compiling {name}", flush=True)
        float(f1(frame))
        float(f2(frame))
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f1(frame))
            t1 = time.perf_counter()
            float(f2(frame))
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / n1)
        print(f"{name:6s} {sorted(diffs)[1] * 1e3:7.2f} ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
