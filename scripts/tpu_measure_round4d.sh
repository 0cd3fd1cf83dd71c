#!/bin/bash
# Round-4 measurement batch D (post batch-C cleanup): (1) a bench.py
# headline retry — batch C's bench landed in a wedge window, so the 979
# figure stands on batch B only; (2) bracket the fused batch sampler's
# 30 fps tick between the measured 192 (25.5 ms) and 256 (34.0 ms)
# points; (3) the TPU parity lane, which now includes the on-chip SSIM
# Precision.HIGHEST test (test_ssim_matches_golden_on_device).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

# (1) headline retry
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 700 python bench.py

# (2) knee bracket: where does the tick cross 33.3 ms?
timeout 580 python -m foveax.cli.main perf --resolutions 1080p --frames 20 \
  --clients 208 224 240

# (3) parity lane incl. the new on-chip SSIM test
FOVEAX_TPU_TESTS=1 timeout 1500 python -m pytest -m tpu tests/ -q -x
