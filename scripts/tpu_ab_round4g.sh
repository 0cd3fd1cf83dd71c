#!/bin/bash
# Same-window A/B/C of the unwarp x geometries + A/B of the sampler
# banding, interleaved per stage so the relay's drifting absolute rates
# cancel (cross-window comparisons are not trustworthy below ~2x —
# BENCHMARKS.md measurement notes).  Fresh process per run.
#
#   unwarp: shave (128/256, -33% bytes AND dot FLOPs)
#           wide  (512/768, -50% bytes, +2x dot FLOPs)
#           r3    (128/384, round-3 guaranteed coverage)
#   sampler: widen (adaptive bands) vs r3 (FOVEAX_SEGREDUCE_WIDEN=0)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

SB="python scripts/stage_bench.py --iters 10"
for res in 16k 8k 4k; do
  for rep in 1 2; do
    for g in shave wide r3; do
      echo "== unwarp $res $g rep$rep"
      FOVEAX_UNWARP_GEOM=$g timeout 900 $SB --resolutions $res \
        --stages unwarp --precision fused
    done
  done
done
for res in 16k 8k 4k; do
  for rep in 1 2; do
    echo "== sampler $res widen rep$rep"
    timeout 900 $SB --resolutions $res --stages fused
    echo "== sampler $res r3 rep$rep"
    FOVEAX_SEGREDUCE_WIDEN=0 timeout 900 $SB --resolutions $res --stages fused
  done
done
