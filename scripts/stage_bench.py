"""Per-stage device-loop timings for the full foveated path.

Times each stage (SAT build, gaze sample, unwarp) with a strictly
serialized `lax.fori_loop` whose carry makes every iteration data-
dependent on the previous one (so XLA cannot hoist the loop-invariant
body — the failure mode the round-2 advisor caught in svd_bench), ending
in a scalar readback.  `block_until_ready` is not a reliable fence
through the remote device relay (CLAUDE.md), so all timings are
dependency-chained.

Backs the "Stage costs" table in BENCHMARKS.md.

Usage: python scripts/stage_bench.py [--resolutions 4k 8k 16k] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

RES = {
    "1080p": (1920, 1080),
    "4k": (3840, 2160),
    "8k": (7680, 4320),
    "16k": (15360, 8640),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolutions", nargs="*", default=["4k", "8k"], choices=RES)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--precision", default="auto",
        choices=["exact", "fast", "mm", "fused", "auto"]
    )
    ap.add_argument(
        "--stages",
        nargs="*",
        default=["sat", "sample", "unwarp"],
        choices=["sat", "sample", "unwarp", "direct", "fused"],
        help="subset to time (each stage loop costs one remote compile); "
        "'direct' is the SAT-free XLA sampler, 'fused' the Pallas "
        "segment-reduce pipeline (each replaces sat+sample)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foveax.config import reduced_dim
    from foveax.core.logrect import make_grid
    from foveax.core.sample import sample_rect_from_sat
    from foveax.core.direct import sample_rect_direct
    from foveax.core.unwarp import unwarp_rect
    from foveax.kernels.segreduce import sample_rect_fused
    from foveax.kernels.scan2d import build_sat_pallas as build_sat

    rng = np.random.default_rng(0)

    def timed(fn, *xs) -> float:
        """Median-of-3 wall time of jitted fn (already compiled)."""
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*xs)
            float(jnp.asarray(out).reshape(-1)[0])
            best.append(time.perf_counter() - t0)
        return sorted(best)[1]

    for res in args.resolutions:
        src_w, src_h = RES[res]
        red_w, red_h = reduced_dim(src_w), reduced_dim(src_h)
        grid = make_grid(red_w, red_h, src_w, src_h)
        frame = jax.device_put(
            rng.integers(0, 256, size=(3, src_h, src_w), dtype=np.uint8)
        )
        n = args.iters

        # Per-frame gaze trace, indexed inside the loop (traced, no recompile).
        t = np.linspace(0.0, 1.0, n)
        centers = jnp.asarray(
            np.stack(
                [0.5 + 0.4 * np.sin(2 * np.pi * t), 0.5 + 0.3 * np.cos(2 * np.pi * t)],
                axis=-1,
            ).astype(np.float32)
        )

        @jax.jit
        def sat_loop(frame):
            def body(i, carry):
                f, acc = carry
                sat = build_sat(f, in_layout="chw")
                # Carry a value-dependence back into the input: flip the
                # low bit of one pixel by the SAT corner's parity.  Not
                # foldable; one scalar of extra work per iteration.
                f = f.at[0, 0, 0].set(
                    (f[0, 0, 0] ^ (sat[0, 0, 0] & 1)).astype(jnp.uint8)
                )
                return f, acc + sat[-1, -1, -1]

            _, acc = jax.lax.fori_loop(0, n, body, (frame, jnp.uint32(0)))
            return acc

        @jax.jit
        def sample_loop(sat):
            def body(i, acc):
                c = centers[i] + acc * jnp.float32(1e-30)
                red = sample_rect_from_sat(sat, grid, c, out_layout="chw")
                return acc + red[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        @jax.jit
        def direct_loop(frame):
            def body(i, acc):
                c = centers[i] + acc * jnp.float32(1e-30)
                red = sample_rect_direct(frame, grid, c, out_layout="chw")
                return acc + red[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        @jax.jit
        def fused_loop(frame):
            def body(i, acc):
                c = centers[i] + acc * jnp.float32(1e-30)
                red = sample_rect_fused(frame, grid, c, out_layout="chw")
                return acc + red[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        @jax.jit
        def unwarp_loop(red):
            def body(i, acc):
                c = centers[i] + acc * jnp.float32(1e-30)
                out = unwarp_rect(
                    red,
                    src_w,
                    src_h,
                    c,
                    in_layout="chw",
                    out_layout="chw",
                    precision=args.precision,
                )
                return acc + out[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        sat = jax.jit(lambda f: build_sat(f, in_layout="chw"))(frame)
        red = jax.jit(
            lambda s: sample_rect_from_sat(s, grid, centers[0], out_layout="chw")
        )(sat)
        float(jnp.sum(red.astype(jnp.uint32)))  # materialize inputs

        stages = {
            "sat": ("sat_build", sat_loop, frame),
            "sample": ("gaze_sample", sample_loop, sat),
            "direct": ("direct_sample", direct_loop, frame),
            "fused": ("fused_sample", fused_loop, frame),
            "unwarp": (f"unwarp_{args.precision}", unwarp_loop, red),
        }
        for name, fn, x in (stages[s] for s in args.stages):
            fn(x)  # compile + warm
            ms = timed(fn, x) / n * 1e3
            print(f"{res} {name}: {ms:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    sys.exit(main())
