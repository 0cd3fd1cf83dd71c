"""Differential fuzz: fused Pallas pair vs float64 goldens at random
ELIGIBLE NON-PRODUCTION shapes and gazes, interpret mode.

The fixed-shape suites sweep window invariants and bit-parity at the
production sizes; this harness explores the rest of the eligible shape
space (width % 128 == 0, any height) where two silent-corruption bugs
were found and fixed in round 3:

  * y pass: quantized DMA bases vs an UNaligned clip bound (src_h % 8
    != 0) left bottom-clamped cells up to 7 rows outside their window
    -> fixed by 8-aligned row padding in y_segment_reduce.
  * x pass: a band k clamped to the full width discarded the quantum
    slack, so a quantized nonzero base could not cover a circular
    block's tail -> fixed by anchoring whole-period windows at base 0.

Checks: sampler bit-equality vs the golden SAT path; fused unwarp
within 1 LSB of the exact path; the BATCHED sampler
(sample_rect_fused_batch — the round-4 serving hot path through
batch_pair / jit_serve_parts_fused) bit-equal per gaze on a batch that
always contains a duplicate pair and an edge-clamped gaze.  Exit 1 on
any failure.

Usage: python scripts/fuzz_fused.py [seed] [n_shapes]
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from foveax.config import reduced_dim
from foveax.core import golden
from foveax.core.logrect import make_grid
from foveax.core.unwarp import unwarp_rect
from foveax.kernels.segreduce import sample_rect_fused, sample_rect_fused_batch
from foveax.kernels.unwarp_pl import _KX, _KY, unwarp_rect_fused


def main() -> int:
    rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
    # 128/256: every x band clamps to the whole period there, so the
    # orchestrator allocates ZERO wrap pad (partial-band sizing).
    widths = [128, 256, 384, 512, 640, 768, 896, 1024, 1152, 1280]
    n_shapes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    fails = 0
    for t in range(n_shapes):
        fw = int(rng.choice(widths))
        fh = int(rng.integers(96, 700))
        rw, rh = reduced_dim(fw), reduced_dim(fh)
        frame_np = rng.integers(0, 256, (fh, fw, 3), np.uint8)
        g = make_grid(rw, rh, fw, fh)
        dense = golden.grid_dense(rw, rh, fw, fh)
        gj = dataclasses.replace(
            g, gx=jnp.asarray(dense[0, :, 0]), gy=jnp.asarray(dense[:, 0, 1])
        )
        fr = jnp.asarray(frame_np.transpose(2, 0, 1))
        sat_np = golden.build_sat(frame_np)
        gazes = [tuple(rng.uniform(0, 1, 2)), (0.0, 1.0), (1.0, 0.0),
                 (0.997, 0.003)]
        for center in gazes[: 3 if t % 2 else 4]:
            c = jnp.asarray(center, jnp.float32)
            t0 = time.time()
            try:
                red = sample_rect_fused(
                    fr, gj, c, out_layout="chw", interpret=True
                )
                want_red = golden.sample_rect(
                    sat_np, dense, center
                ).transpose(2, 0, 1)
                eq = np.array_equal(np.asarray(red), want_red)
                # The kernel's own eligibility contract (callers fall
                # back to "mm" on ValueError); the old literal gate
                # (rw >= 144) encoded the pre-Mosaic-fix slab width and
                # miscounted documented ineligibility as failures.
                if rh >= _KY and rw >= _KX:
                    fused = unwarp_rect_fused(
                        red, fw, fh, c, in_layout="chw", out_layout="chw",
                        interpret=True,
                    )
                    exact = unwarp_rect(
                        red, fw, fh, c, in_layout="chw", out_layout="chw"
                    )
                    d = int(np.abs(
                        np.asarray(fused).astype(np.int16)
                        - np.asarray(exact).astype(np.int16)
                    ).max())
                else:
                    d = -1
                ok = eq and d <= 1
            except Exception as e:  # noqa: BLE001 - report and count
                print(f"{fw}x{fh} r{rw}x{rh} {center}: EXC {e!r}", flush=True)
                fails += 1
                continue
            print(
                f"{fw}x{fh} r{rw}x{rh} gaze ({center[0]:.3f},{center[1]:.3f}):"
                f" sampler_eq={eq} unwarp_maxd={d} ({time.time() - t0:.1f}s)",
                flush=True,
            )
            fails += 0 if ok else 1

        # Batch lane: duplicate pair + edge-clamped gaze + random gazes
        # in ONE launch; each slice must be bit-equal to the golden.
        dup = rng.uniform(0.05, 0.95, 2)
        batch = np.stack(
            [dup, dup, np.asarray([1.0, 0.0]), rng.uniform(0, 1, 2)]
        ).astype(np.float32)
        t0 = time.time()
        try:
            reds = np.asarray(
                sample_rect_fused_batch(
                    fr, gj, jnp.asarray(batch), out_layout="chw",
                    interpret=True,
                )
            )
            bad = []
            for bi, center in enumerate(batch):
                want = golden.sample_rect(
                    sat_np, dense, tuple(center)
                ).transpose(2, 0, 1)
                if not np.array_equal(reds[bi], want):
                    bad.append(bi)
            if not np.array_equal(reds[0], reds[1]):
                bad.append("dup-mismatch")
        except Exception as e:  # noqa: BLE001 - report and count
            print(f"{fw}x{fh} batch: EXC {e!r}", flush=True)
            fails += 1
        else:
            print(
                f"{fw}x{fh} r{rw}x{rh} batch x{len(batch)}: "
                f"bad={bad or 'none'} ({time.time() - t0:.1f}s)",
                flush=True,
            )
            fails += 1 if bad else 0
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
