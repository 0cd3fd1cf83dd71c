"""Mosaic compile-time bisect for the fused Pallas kernels.

Round 3 observed NON-RETURNING (>420 s) Mosaic compiles for the fused
segment-reduce sampler at 4K and the fused unwarp at >= 8K, while the
8K sampler and <= 4K unwarp compiled in minutes — with no root cause
recorded (VERDICT round 3, Weak #1).  This tool compiles ONE unit per
process invocation with `jax.jit(...).lower(...).compile()` split into
separately-timed phases, printing progress lines with flush so a killed
run still yields partial evidence.  The driver
(scripts/tpu_bisect_round4.sh) runs units under `timeout` so no unit
can hold the tunnel past its bound.

Units
  samp:<res>     full fused sampler (both passes)    kernels/segreduce.py
  samp_y:<res>   y segment-reduce pass only
  samp_x:<res>   x segment-reduce pass only
  unwarp:<res>   full fused unwarp                   kernels/unwarp_pl.py

Ablation knobs (monkeypatched module globals — diagnostic only):
  --only-bands I...   keep only these band indices (per pass)
  --no-dbuf           force single-buffered slab DMA
  --chy/--chx N       override the cast/dot chunk sizes

Output lines (space-separated, machine-parseable):
  bisect <unit> lower_s <t>
  bisect <unit> compile_s <t>
  bisect <unit> first_run_ms <t>
  bisect <unit> run_ms <median> of <n>
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
    ap.add_argument("--unit", required=True)
    ap.add_argument("--only-bands", type=int, nargs="*", default=None)
    ap.add_argument("--no-dbuf", action="store_true")
    ap.add_argument("--chy", type=int, default=None)
    ap.add_argument("--chx", type=int, default=None)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()
    unit = args.unit

    import jax
    import jax.numpy as jnp

    import foveax.kernels.segreduce as seg
    from foveax.config import reduced_dim
    from foveax.core.logrect import make_grid
    from foveax.core.sample import _axis_taps

    if jax.default_backend() == "cpu" and not args.allow_cpu:
        print(f"bisect {unit} SKIP cpu-backend", flush=True)
        return 3
    print(f"bisect {unit} backend {jax.default_backend()}", flush=True)

    if args.no_dbuf:
        seg._dbuf_fits = lambda *a, **k: False
    if args.chy:
        seg._CH_Y = args.chy
    if args.chx:
        seg._CH_X = args.chx
    if args.only_bands is not None:
        keep = set(args.only_bands)
        orig = seg._kernel_bands

        def patched(g_bytes, dim, s_cells, quantum=8):
            bands = orig(g_bytes, dim, s_cells, quantum)
            return tuple(b for i, b in enumerate(bands) if i in keep)

        seg._kernel_bands = patched

    kind, res = unit.split(":")
    sw, sh = RES[res]
    rw, rh = reduced_dim(sw), reduced_dim(sh)
    grid = make_grid(rw, rh, sw, sh)
    gx = np.asarray(grid.gx, dtype=np.int64)
    gy = np.asarray(grid.gy, dtype=np.int64)
    rng = np.random.default_rng(0)

    if kind in ("samp", "samp_y"):
        x = jax.device_put(
            rng.integers(0, 256, size=(3, sh, sw), dtype=np.uint8)
        )
    if kind == "samp":

        def f(fr, c):
            return seg.sample_rect_fused(fr, grid, c, out_layout="chw")

    elif kind == "samp_y":
        # Same pad_blocks the full pipeline passes (wrap pad for x).
        partial = [
            b.k
            for b, _s in seg._adaptive_bands(
                gx.tobytes(), sw, seg._SX, 128, seg._MINOR_CAP_X, 2
            )
            if b.k < sw
        ]
        wb = seg._wb(sw)
        pad_blocks = -(-max(partial) // wb) if partial else 0

        def f(fr, c):
            cy = (c[1] * jnp.float32(sh)).astype(jnp.int32)
            pyc, pymc, _, _, _ = _axis_taps(grid.gy, cy, sh, wrap=False)
            return seg.y_segment_reduce(
                fr, pymc + 1, pyc + 1, gy, pad_blocks=pad_blocks
            )

    elif kind == "samp_x":
        partial = [
            b.k
            for b, _s in seg._adaptive_bands(
                gx.tobytes(), sw, seg._SX, 128, seg._MINOR_CAP_X, 2
            )
            if b.k < sw
        ]
        wb = seg._wb(sw)
        pad_blocks = -(-max(partial) // wb) if partial else 0
        nwb = sw // wb + pad_blocks
        x = jax.device_put(
            rng.integers(0, 6000, size=(3, rh, nwb * wb), dtype=np.uint16)
        )

        def f(rows, c):
            cx = (c[0] * jnp.float32(sw)).astype(jnp.int32)
            cy = (c[1] * jnp.float32(sh)).astype(jnp.int32)
            pxc, pxmc, valid_x, _, _ = _axis_taps(grid.gx, cx, sw, wrap=True)
            pyc, pymc, valid_y, _, _ = _axis_taps(grid.gy, cy, sh, wrap=False)
            return seg.x_segment_reduce(
                rows, pxmc + 1, pxc + 1, valid_x, valid_y, pyc - pymc,
                gx, sw, wrap=True,
            )

    elif kind == "unwarp":
        from foveax.kernels.unwarp_pl import unwarp_rect_fused

        x = jax.device_put(
            rng.integers(0, 256, size=(3, rh, rw), dtype=np.uint8)
        )

        def f(red, c):
            return unwarp_rect_fused(
                red, sw, sh, c, in_layout="chw", out_layout="chw"
            )

    else:
        raise SystemExit(f"unknown unit kind {kind!r}")

    centers = [
        jnp.asarray([0.5 + 0.4 * np.sin(t), 0.5 + 0.3 * np.cos(t)], jnp.float32)
        for t in np.linspace(0.0, 6.0, args.iters + 1)
    ]

    jf = jax.jit(f)
    t0 = time.perf_counter()
    lowered = jf.lower(x, centers[0])
    t1 = time.perf_counter()
    print(f"bisect {unit} lower_s {t1 - t0:.1f}", flush=True)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"bisect {unit} compile_s {t2 - t1:.1f}", flush=True)

    def once(c) -> float:
        t0 = time.perf_counter()
        out = compiled(x, c)
        float(jnp.asarray(out).reshape(-1)[0])
        return (time.perf_counter() - t0) * 1e3

    print(f"bisect {unit} first_run_ms {once(centers[0]):.2f}", flush=True)
    times = sorted(once(c) for c in centers[1:])
    print(
        f"bisect {unit} run_ms {times[len(times) // 2]:.2f} of {len(times)}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
