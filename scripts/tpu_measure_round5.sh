#!/bin/bash
# Round-5 measurement batch A (run once per healthy window):
#   0. on-chip fused parity — GATES everything below (a batch must never
#      publish headline numbers for a kernel configuration whose parity
#      just failed: round-4 ADVICE item 3)
#   1. pure-stream HBM ceiling microbench (fresh process)
#   2. scan + fused sampler + fused unwarp stage costs in the SAME
#      window (fresh processes) -> %-of-delivered per stage
#   3. full-path refresh at 4k/8k/16k (the 16K two-window question)
#   4. batched-sampler knee points at 4K and 8K (round-4 only measured
#      1080p) + the 1080p 240/256 bracket re-check
#   5. bench.py headline
# Every item is timeout-bounded so a mid-batch wedge cannot hold the
# tunnel when the round-end driver runs bench.py.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

FOVEAX_TPU_TESTS=1 timeout 900 python -m pytest tests/test_tpu_parity.py \
  -q -m tpu -k fused -x || { echo "PARITY-FAILED: batch aborted"; exit 1; }

timeout 1500 python scripts/hbm_stream_bench.py --iters 8 --mb 128

timeout 600 python scripts/stage_bench.py --resolutions 16k --stages sat
timeout 600 python scripts/stage_bench.py --resolutions 16k --stages fused
timeout 600 python scripts/stage_bench.py --resolutions 16k --stages unwarp \
  --precision fused

timeout 1500 python scripts/unwarp_diag.py --res 16k --iters 12

timeout 1200 python -m foveax.cli.main perf --resolutions 4k 8k 16k

timeout 1200 python -m foveax.cli.main perf --resolutions 4k \
  --clients 8 16 32 48 64 --batch-sampler fused
timeout 1200 python -m foveax.cli.main perf --resolutions 8k \
  --clients 4 8 12 16 --batch-sampler fused
timeout 900 python -m foveax.cli.main perf --resolutions 1080p \
  --clients 240 256 --batch-sampler fused

FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py
