#!/bin/bash
# One-shot measurement batch for a healthy tunnel window (round 3):
# fused/direct/SAT stage timings at every resolution, the headline
# bench, and the on-chip parity lane. Each python process holds the
# tunnel alone; run nothing else concurrently.
#
# Ordered so the most decision-relevant results land first in case the
# window wedges mid-batch: 4K/8K fused sampler + unwarp timings (they
# decide the auto defaults and the headline), then the red/green parity
# lane, then the remaining sizes and the composed path.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# Share compiled executables across the batch's processes where the
# backend honors the persistent cache (harmless where it doesn't).
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
timeout 580 python scripts/stage_bench.py --resolutions 4k --iters 20 --stages fused
timeout 580 python scripts/stage_bench.py --resolutions 1080p 4k --iters 20 --stages unwarp --precision fused
timeout 580 python scripts/stage_bench.py --resolutions 1080p 4k --iters 20 --stages unwarp --precision mm
timeout 580 python scripts/stage_bench.py --resolutions 8k --iters 12 --stages fused
timeout 580 python scripts/stage_bench.py --resolutions 8k 16k --iters 10 --stages unwarp --precision fused
timeout 580 python scripts/stage_bench.py --resolutions 8k 16k --iters 10 --stages unwarp --precision mm
FOVEAX_TPU_TESTS=1 timeout 3000 python -m pytest -m tpu tests/ -q
timeout 580 python scripts/stage_bench.py --resolutions 16k --iters 8 --stages fused
timeout 580 python scripts/stage_bench.py --resolutions 1080p --iters 20 --stages fused
timeout 580 python scripts/stage_bench.py --resolutions 8k --iters 12 --stages direct
timeout 580 python scripts/stage_bench.py --resolutions 16k --iters 8 --stages direct
# Composed full fused path (fused sampler + fused unwarp) vs current auto.
timeout 580 python -m foveax.cli.main perf --resolutions 1080p 4k --frames 20 --sampler fused --precision fused
timeout 580 python -m foveax.cli.main perf --resolutions 8k 16k --frames 10 --sampler fused --precision fused
timeout 580 python bench.py
