#!/bin/bash
# Round-4 measurement batch B (after the policy flip): (1) the extended
# fused batched-gaze client sweep — batch A stopped at 48 members and the
# fused curve was still flat (8.44 ms), so the new knee is unmeasured;
# (2) the 16K fused-sampler stage retry (batch A's run printed nothing —
# presumed a wedge window, every other 16K unit compiled and ran);
# (3) end-to-end perf through the NEW autos (no explicit sampler /
# precision flags — validates the measured policy on chip); (4) the TPU
# parity lane against the flipped autos; (5) the fixed bench.py headline
# (median-of-3 paired timing replaces the single-sample subtraction that
# produced the bogus 3e10 fps fused_full line in batch A).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

# (1) the new knee: one consistent fused sweep far past the old 48 knee
timeout 580 python -m foveax.cli.main perf --resolutions 1080p --frames 20 \
  --clients 8 16 32 48 64 96 128 192 256 --batch-sampler fused

# (2) 16K fused sampler stage retry
timeout 580 python scripts/stage_bench.py --resolutions 16k --iters 8 --stages fused

# (3) the composed path through the flipped autos (auto = fused+fused now)
timeout 580 python -m foveax.cli.main perf --resolutions 1080p 4k 8k 16k --frames 15

# (4) parity lane against the new autos
FOVEAX_TPU_TESTS=1 timeout 1500 python -m pytest -m tpu tests/ -q

# (5) honest headline with the robust measure()
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 700 python bench.py
