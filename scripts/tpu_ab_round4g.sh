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
# Sampler arms: default (widen+gate) / gate-off (isolates the validity-
# gated DMA skipping) / round-3 (widen off, gate off).
for res in 16k 8k 4k; do
  for rep in 1 2; do
    echo "== sampler $res default rep$rep"
    timeout 900 $SB --resolutions $res --stages fused
    echo "== sampler $res nogate rep$rep"
    FOVEAX_SEGREDUCE_GATE=0 timeout 900 $SB --resolutions $res --stages fused
    echo "== sampler $res r3 rep$rep"
    FOVEAX_SEGREDUCE_WIDEN=0 FOVEAX_SEGREDUCE_GATE=0 timeout 900 $SB \
      --resolutions $res --stages fused
  done
done

# On-chip parity for the fused kernels with the new default geometry
# (batch G ran this without FOVEAX_TPU_TESTS=1 and it skipped).
FOVEAX_TPU_TESTS=1 timeout 1200 python -m pytest tests/test_tpu_parity.py \
  -q -m tpu -k fused -x

# Knee bracket with the new kernels (the fused batch path drives the
# 240-client density figure) + full path + headline, still same-window.
timeout 1200 python -m foveax.cli.main perf --resolutions 1080p \
  --clients 192 240 256 --batch-sampler fused
timeout 1200 python -m foveax.cli.main perf --resolutions 4k 8k 16k
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py
