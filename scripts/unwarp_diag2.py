"""Second unwarp decomposition: production pipeline with pieces removed.

unwarp_diag.py showed the x-pass STRUCTURE costs ~2.2 ms at 16K while
the production stage measures ~9 ms in the same window.  This harness
times the real `unwarp_rect_fused` with surgical substitutions:

  full     the production path
  nofix    `_jump_fixup` replaced by identity (isolates the top_k +
           gather + scatter repair cost)
  fixonly  the fixup applied to precomputed tensors (cross-check)

full - nofix = fixup; nofix - (synthetic x ~2.2) ~= y pass + wrap pad.

Usage: python scripts/unwarp_diag2.py [--res 16k] [--iters 10]
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

    import foveax.core.unwarp as unwarp_mod
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

    real_fixup = unwarp_mod._jump_fixup

    def run_variant(name, fixup):
        unwarp_mod._jump_fixup = fixup

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
        t = sorted(diffs)[1]
        print(f"{name:7s} {t * 1e3:7.2f} ms/frame", flush=True)
        unwarp_mod._jump_fixup = real_fixup

    run_variant("full", real_fixup)
    run_variant("nofix", lambda out, *a, **k: out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
