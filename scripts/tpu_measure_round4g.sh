#!/bin/bash
# Round-4 measurement batch G: the slack-amortized wide-block geometry.
#
# What changed since batch F: the fused unwarp x pass picks its column
# block per shape (_x_geom: lx=512/kx=768 at 8K/16K instead of 128/384,
# halving the dominant slab read), and the fused sampler widens
# low-span bands (fovea 128->512-cell blocks at quantum slack ~1.5x
# instead of 3x).  Static accounting: 16K unwarp x read 1194->597 MB,
# 8K 299->149 MB; 16K sampler x 1349->1095 MB, y 1181->1097 MB.
#
# Fresh process per stage (in-process stage sequencing inflates later
# stages up to 1.8x — BENCHMARKS.md measurement notes); every number is
# a dependency-chained device loop.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

# Stage timings: the fused pair at every production size.
for res in 4k 8k 16k; do
  timeout 900 python scripts/stage_bench.py --resolutions $res \
    --stages fused --iters 10
  timeout 900 python scripts/stage_bench.py --resolutions $res \
    --stages unwarp --precision fused --iters 10
done
# 1080p fused unwarp now picks lx=384 (was 128): one parity + timing run.
timeout 900 python scripts/stage_bench.py --resolutions 1080p \
  --stages fused --iters 10
timeout 900 python scripts/stage_bench.py --resolutions 1080p \
  --stages unwarp --precision fused --iters 10

# On-chip parity for the fused kernels (the lane that gates autos).
timeout 1200 python -m pytest tests/test_tpu_parity.py -q -m tpu -k "fused" -x

# Full path through the default autos + the explicit fused pair.
timeout 1200 python -m foveax.cli.main perf --resolutions 4k 8k 16k
timeout 1200 python -m foveax.cli.main perf --resolutions 4k 8k 16k \
  --sampler fused --precision fused

# Headline.
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py
