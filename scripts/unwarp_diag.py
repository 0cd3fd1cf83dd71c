"""Decompose the fused unwarp x-pass's time budget at a given shape.

The round-4 byte-roofline fit attributed the 16K fused unwarp's ~9 ms
"constant" to HBM traffic at the then-assumed 133-300 GB/s stream rates.
The round-5 pure-stream microbench (hbm_stream_bench.py) measures the
delivered ceiling at 650-800 GB/s, under which the kernel's ~1.8 GB
should cost ~3 ms — so something else owns the budget.  This harness
builds x-pass-shaped Pallas kernels (same grid, same block geometry,
same double-buffered window DMA as kernels/unwarp_pl.py) with parts
removed, timing each with dependency-chained paired-difference loops:

  full      DMA + u8->f32 cast + 3 one-hot dots + divide + write
  nodot     DMA + write (the byte path alone)
  nodma     cast + dots + write on resident scratch (the compute path)
  dotconst  dots on a constant plane + write (dot cost without the cast)
  nodiv     full, but x * (1/dn) with the reciprocal hoisted to one
            divide per column (is the per-element f32 divide the cost?)

cast cost ~= nodma - dotconst; DMA vs compute overlap shows as
full < nodot + nodma.  Synthetic one-hot metadata (step-1 windows) keeps
the math shapes identical to production.

Usage: python scripts/unwarp_diag.py [--res 16k] [--iters 12]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

RES = {
    "4k": (3840, 2160),
    "8k": (7680, 4320),
    "16k": (15360, 8640),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="16k", choices=RES)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from foveax.config import reduced_dim
    from foveax.kernels.dbuf import dbuf_slot
    from foveax.kernels.unwarp_pl import _x_geom

    out_w, out_h = RES[args.res]
    red_w = reduced_dim(out_w)
    lx, kx, hb = _x_geom(out_w, out_h, red_w)
    nbx, nrb = out_w // lx, out_h // hb
    wp = -(-(red_w + kx) // 128) * 128
    print(f"{args.res}: lx={lx} kx={kx} hb={hb} grid=({nbx},{nrb}) wp={wp}")

    # Synthetic per-block metadata with production shapes: step-1 windows
    # starting at a 128-quantized base, rel in [0, kx-2].
    bases = (np.arange(nbx, dtype=np.int32) * (red_w // nbx) // 128)
    rel = np.minimum(np.arange(lx, dtype=np.int32), kx - 2)
    rel_b = np.broadcast_to(rel, (nbx, 1, lx)).astype(np.int32)
    s_b = np.ones((nbx, 1, lx), np.int32)
    n_b = np.full((nbx, 1, lx), 7, np.int32)
    d_b = np.full((nbx, 1, lx), 23, np.int32)

    def vec_spec(s):
        return pl.BlockSpec(
            (1, 1, s), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def kernel(base_ref, lo_ref, s_ref, n_ref, d_ref, rows_hbm, out_ref,
               slab, sem, *, variant):
        i = pl.program_id(0)
        j = pl.program_id(1)

        if variant != "nodma":
            def copy(t2, sl):
                ii, jj = t2 // nrb, jax.lax.rem(t2, nrb)
                return pltpu.make_async_copy(
                    rows_hbm.at[:, pl.ds(jj * hb, hb),
                                pl.ds(base_ref[ii] * 128, kx)],
                    slab.at[sl], sem.at[sl],
                )
            slot = dbuf_slot(copy, i * nrb + j, nbx * nrb)
        else:
            slot = 0

        if variant == "nodot":
            out_ref[...] = slab[slot, :, :, :lx]
            return
        lo = lo_ref[0, 0, :][None, :]
        s = s_ref[0, 0, :][None, :]
        nm = n_ref[0, 0, :][None, :].astype(jnp.float32)
        dn = d_ref[0, 0, :][None, :].astype(jnp.float32)
        ks = jax.lax.broadcasted_iota(jnp.int32, (kx, lx), 0)
        oh = jnp.where(ks == lo, dn - nm, 0.0) + jnp.where(ks == lo + s, nm, 0.0)
        rdn = 1.0 / dn  # one divide per column (nodiv variant)
        outs = []
        for c in range(3):
            if variant == "dotconst":
                x = jnp.zeros((hb, kx), jnp.float32) + jnp.float32(c + 1)
            else:
                x = slab[slot, c, :, :].astype(jnp.int32).astype(jnp.float32)
            numdot = jax.lax.dot_general(
                x, oh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if variant == "nodiv":
                q = numdot * rdn + 0.01
            else:
                q = numdot / dn + 0.01
            outs.append(q.astype(jnp.int32).astype(jnp.uint8))
        out_ref[...] = jnp.stack(outs)

    def build(variant):
        return pl.pallas_call(
            functools.partial(kernel, variant=variant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nbx, nrb),
                in_specs=[
                    vec_spec(lx), vec_spec(lx), vec_spec(lx), vec_spec(lx),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (3, hb, lx), lambda i, j, *_: (0, j, i),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, 3, hb, kx), jnp.uint8),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((3, out_h, out_w), jnp.uint8),
        )

    @functools.partial(jax.jit, static_argnames=("variant", "iters"))
    def loop(yb, variant, iters):
        call = build(variant)

        def body(i, carry):
            yb, acc = carry
            out = call(
                jnp.asarray(bases), jnp.asarray(rel_b), jnp.asarray(s_b),
                jnp.asarray(n_b), jnp.asarray(d_b), yb,
            )
            probe = out[0, 0, 0].astype(jnp.int32)
            upd = (yb[0:1, 0:1, 0:1] ^ (probe & 1).astype(jnp.uint8))
            yb = jax.lax.dynamic_update_slice(yb, upd, (0, 0, 0))
            return yb, acc + probe

        _, acc = jax.lax.fori_loop(0, iters, body, (yb, jnp.int32(0)))
        return acc

    yb = jax.jit(
        lambda: (
            jax.lax.broadcasted_iota(jnp.int32, (3, out_h, wp), 2)
            + jax.lax.broadcasted_iota(jnp.int32, (3, out_h, wp), 1)
        ).astype(jnp.uint8)
    )()

    n1, n2 = args.iters, 2 * args.iters
    for variant in ("full", "nodot", "nodma", "dotconst", "nodiv"):
        f1 = functools.partial(loop, variant=variant, iters=n1)
        f2 = functools.partial(loop, variant=variant, iters=n2)
        print(f"# compiling {variant}", flush=True)
        int(f1(yb))
        int(f2(yb))
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(f1(yb))
            t1 = time.perf_counter()
            int(f2(yb))
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / n1)
        t = sorted(diffs)[1]
        print(f"{variant:9s} {t * 1e3:7.2f} ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
