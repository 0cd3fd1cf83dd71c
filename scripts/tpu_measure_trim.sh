#!/bin/bash
# Trimmed round-3 measurement batch for a short healthy window (~45 min cap).
# Same ordering as tpu_measure_round3.sh, tighter bounds.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
timeout 420 python scripts/stage_bench.py --resolutions 4k --iters 20 --stages fused
timeout 420 python scripts/stage_bench.py --resolutions 1080p 4k --iters 20 --stages unwarp --precision fused
timeout 420 python scripts/stage_bench.py --resolutions 1080p 4k --iters 20 --stages unwarp --precision mm
timeout 420 python scripts/stage_bench.py --resolutions 8k --iters 12 --stages fused
timeout 420 python scripts/stage_bench.py --resolutions 8k 16k --iters 10 --stages unwarp --precision fused
timeout 420 python scripts/stage_bench.py --resolutions 8k 16k --iters 10 --stages unwarp --precision mm
timeout 420 python scripts/stage_bench.py --resolutions 16k --iters 8 --stages fused
timeout 420 python scripts/stage_bench.py --resolutions 1080p --iters 20 --stages fused
FOVEAX_TPU_TESTS=1 timeout 1500 python -m pytest -m tpu tests/ -q -x
timeout 420 python -m foveax.cli.main perf --resolutions 1080p 4k --frames 20 --sampler fused --precision fused
timeout 420 python -m foveax.cli.main perf --resolutions 8k 16k --frames 10 --sampler fused --precision fused
# Probe bound (+ the empty-probe retry: health window 300 + retry bound
# 240) + device wait + floor compile/measure must fit inside the outer
# timeout — a probe that hangs to its bound must not cost the headline
# JSON.
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py
