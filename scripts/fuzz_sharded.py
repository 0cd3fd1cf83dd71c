"""Differential fuzz: the sharded serving paths vs the single-device
paths at random shapes, gaze batches, and mesh factorizations, on a
virtual 8-CPU-device mesh.

The fixed-shape suites (tests/test_parallel.py) pin bit-parity at a few
shapes on one (2, 4) mesh; this harness explores the interaction space
where sharding bugs live — row-block boundaries vs the blocked scan's
carry all-gather, data-axis batch splits, whole-axis meshes (1x8 / 8x1),
and the fused path's replicated-frame layout:

  * sharded_build_sat    == build_sat            (exact, u32 wrap)
  * sharded_sample_batch == sample_rect_from_sat (exact per gaze)
  * sharded_sample_batch_fused == the SAT path   (exact per gaze)
  * multi_client_step    == sample + unwarp      (exact; unwarp ==)

Exit 1 on any failure.  Usage: python scripts/fuzz_sharded.py [seed]
[n_shapes].  Shapes stay small (interpret-mode Pallas inside shard_map
is the slow path) — the goal is structural coverage, not throughput.
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp

from foveax.config import reduced_dim
from foveax.core.logrect import make_grid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat
from foveax.core.unwarp import unwarp_rect
from foveax.kernels.segreduce import fused_eligible
from foveax.parallel import make_mesh, multi_client_step
from foveax.parallel.sharded import (
    sharded_build_sat,
    sharded_sample_batch,
    sharded_sample_batch_fused,
)


def main() -> int:
    rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
    n_shapes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    meshes = [(1, 8), (2, 4), (4, 2), (8, 1)]  # (data, space)
    widths = [128, 256, 384, 512, 640]
    fails = 0
    for t in range(n_shapes):
        n_data, n_space = meshes[int(rng.integers(len(meshes)))]
        mesh = make_mesh(n_space=n_space, n_data=n_data)
        fw = int(rng.choice(widths))
        # H must divide by the space axis for the row-sharded scan.
        fh = n_space * int(rng.integers(max(96 // n_space, 2), 200 // n_space + 1))
        rw, rh = reduced_dim(fw), reduced_dim(fh)
        n_gazes = n_data * int(rng.integers(1, 4))
        frame_np = rng.integers(0, 256, (fh, fw, 3), np.uint8)
        frame = jnp.asarray(frame_np)
        g = make_grid(rw, rh, fw, fh)
        centers_np = rng.uniform(0.0, 1.0, (n_gazes, 2)).astype(np.float32)
        # Exercise the clamp edges too.
        centers_np[0] = (0.0, 1.0)
        if n_gazes > 1:
            centers_np[1] = (0.997, 0.003)
        centers = jnp.asarray(centers_np)
        t0 = time.time()
        try:
            # Single-device references.
            sat_ref = build_sat(frame)
            red_ref = np.stack(
                [
                    np.asarray(sample_rect_from_sat(sat_ref, g, c))
                    for c in centers
                ]
            )
            rest_ref = np.stack(
                [
                    np.asarray(unwarp_rect(jnp.asarray(r), fw, fh, c))
                    for r, c in zip(red_ref, centers)
                ]
            )

            sat_sh = sharded_build_sat(frame, mesh)
            sat_eq = np.array_equal(np.asarray(sat_sh), np.asarray(sat_ref))

            red_sh = sharded_sample_batch(sat_sh, centers, g, mesh)
            samp_eq = np.array_equal(np.asarray(red_sh), red_ref)

            red_mc, rest_mc = multi_client_step(
                frame, centers, g, mesh, unwarp=True
            )
            mc_eq = np.array_equal(np.asarray(red_mc), red_ref)
            mc_unwarp_eq = np.array_equal(np.asarray(rest_mc), rest_ref)

            if fused_eligible(g, fh, fw, batch=True):
                red_f = sharded_sample_batch_fused(frame, centers, g, mesh)
                fused_eq = np.array_equal(np.asarray(red_f), red_ref)
            else:
                fused_eq = None
        except Exception as e:  # noqa: BLE001 - report and count
            print(
                f"{fw}x{fh} mesh {n_data}x{n_space} N={n_gazes}: EXC {e!r}",
                flush=True,
            )
            fails += 1
            continue
        ok = sat_eq and samp_eq and mc_eq and mc_unwarp_eq and fused_eq is not False
        print(
            f"{fw}x{fh} r{rw}x{rh} mesh {n_data}x{n_space} N={n_gazes}: "
            f"sat={sat_eq} sample={samp_eq} mc={mc_eq} unwarp={mc_unwarp_eq} "
            f"fused={fused_eq} ({time.time() - t0:.1f}s)",
            flush=True,
        )
        fails += 0 if ok else 1
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
