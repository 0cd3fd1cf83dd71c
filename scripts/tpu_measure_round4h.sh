#!/bin/bash
# Round-4 measurement batch H: record what batch G's tail lost to the
# /tmp wipe — all with the NEW default kernels (shave unwarp geometry,
# widen+gate sampler):
#   1. on-chip fused parity at the new default geometry
#   2. knee bracket through the gated fused batch sampler (does the
#      gating move 240 clients/chip?)
#   3. full-path refresh at 4k/8k/16k
#   4. bench.py headline
# Every item is timeout-bounded so a mid-batch wedge cannot hold the
# tunnel when the round-end driver runs bench.py.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

FOVEAX_TPU_TESTS=1 timeout 900 python -m pytest tests/test_tpu_parity.py \
  -q -m tpu -k fused -x

timeout 1200 python -m foveax.cli.main perf --resolutions 1080p \
  --clients 240 256 272 288 --batch-sampler fused

timeout 1200 python -m foveax.cli.main perf --resolutions 4k 8k 16k

FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py
