"""Third decomposition: which part of the (windowed) jump fixup costs
4.4 ms at 16K?  Monkeypatches _jump_fixup with surgical variants:

  win       the shipped windowed fixup (cond fallback included)
  nocond    windowed without the lax.cond scatter fallback
  nogather  windowed, blend replaced by cur ^ 1 (no yb column gathers)
  nodus     gathers + blend, result folded into one scalar (no
            dynamic_update_slice / output copy)

Usage: python scripts/unwarp_diag3.py [--res 16k] [--iters 10]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import foveax.core.unwarp as um
    from foveax.config import reduced_dim
    from foveax.kernels.unwarp_pl import unwarp_rect_fused

    out_w, out_h = RES[args.res]
    rw, rh = reduced_dim(out_w), reduced_dim(out_h)

    red = jax.jit(
        lambda: (
            jax.lax.broadcasted_iota(jnp.int32, (3, rh, rw), 2)
            + jax.lax.broadcasted_iota(jnp.int32, (3, rh, rw), 1)
        ).astype(jnp.uint8)
    )()

    def make_fixup(kind):
        def fixup(out, yb, badf, ix_lo, ix_hi, nx, dx, fix_k,
                  bias=0.0, assume_covered=False):
            w_out = badf.shape[0]
            width = min(fix_k, w_out)
            start = jnp.clip(
                jnp.argmax(badf).astype(jnp.int32), 0, max(w_out - width, 0)
            )
            cols = start + jnp.arange(width, dtype=jnp.int32)
            cur = jax.lax.dynamic_slice(
                out, (0, 0, start), (out.shape[0], out.shape[1], width)
            )
            if kind == "nogather":
                vals = cur ^ 1
            else:
                vals = um._fixup_blend(yb, cols, ix_lo, ix_hi, nx, dx)
            merged = jnp.where(badf[cols][None, None, :], vals, cur)
            if kind == "nodus":
                # fold the blend into one scalar; no output write-back
                return out.at[0, 0, 0].add(
                    (jnp.max(merged).astype(jnp.int32) & 0).astype(out.dtype)
                )
            return jax.lax.dynamic_update_slice(out, merged, (0, 0, start))
        return fixup

    real = um._jump_fixup

    def run(name, fixup):
        um._jump_fixup = fixup

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(red, iters):
            def body(i, carry):
                red, acc = carry
                c = jnp.asarray([0.3, 0.5], jnp.float32) + acc * jnp.float32(1e-30)
                out = unwarp_rect_fused(
                    red, out_w, out_h, c, in_layout="chw", out_layout="chw"
                )
                probe = out[0, 0, 0].astype(jnp.float32)
                upd = red[0:1, 0:1, 0:1] ^ (probe.astype(jnp.int32) & 1).astype(
                    jnp.uint8
                )
                red = jax.lax.dynamic_update_slice(red, upd, (0, 0, 0))
                return red, acc + probe

            _, acc = jax.lax.fori_loop(0, iters, body, (red, jnp.float32(0)))
            return acc

        n1, n2 = args.iters, 2 * args.iters
        f1 = functools.partial(loop, iters=n1)
        f2 = functools.partial(loop, iters=n2)
        print(f"# compiling {name}", flush=True)
        float(f1(red))
        float(f2(red))
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f1(red))
            t1 = time.perf_counter()
            float(f2(red))
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / n1)
        print(f"{name:9s} {sorted(diffs)[1] * 1e3:7.2f} ms/frame", flush=True)
        um._jump_fixup = real

    run("win", real)
    run("nocond", make_fixup("plain"))
    run("nogather", make_fixup("nogather"))
    run("nodus", make_fixup("nodus"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
