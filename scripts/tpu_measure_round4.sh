#!/bin/bash
# Round-4 measurement batch for a healthy tunnel window.  Ordered by
# decision value: (1) fused-kernel stage timings at the shapes the
# round-3 autos guessed at (the bisect proved every shape compiles in
# 2-18 s — the ">420 s Mosaic compile" was the wedged tunnel), which
# re-set the auto policies by MEASURED perf; (2) the composed 16K path
# (>=30 fps goal); (3) the batched-sampler client sweeps that try to
# move the measured 48-client knee; (4) the parity lane + headline.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

# (1) stage timings for the fused pair at every undecided shape
timeout 580 python scripts/stage_bench.py --resolutions 4k --iters 20 --stages fused direct
timeout 580 python scripts/stage_bench.py --resolutions 16k --iters 8 --stages fused
timeout 580 python scripts/stage_bench.py --resolutions 8k 16k --iters 10 --stages unwarp --precision fused
timeout 580 python scripts/stage_bench.py --resolutions 8k 16k --iters 10 --stages unwarp --precision mm
timeout 580 python scripts/stage_bench.py --resolutions 1080p --iters 20 --stages fused

# (2) composed full fused path, esp. 16K
timeout 580 python -m foveax.cli.main perf --resolutions 16k --frames 10 --sampler fused --precision fused
timeout 580 python -m foveax.cli.main perf --resolutions 4k 8k --frames 15 --sampler fused --precision fused

# (3) batched-sampler client sweeps (the 48-client knee, VERDICT #3)
timeout 580 python -m foveax.cli.main perf --resolutions 1080p --frames 20 --clients 8 16 32 48 64 96 128 --batch-sampler sat
timeout 580 python -m foveax.cli.main perf --resolutions 1080p --frames 20 --clients 8 16 32 48 64 96 128 --batch-sampler direct
timeout 580 python -m foveax.cli.main perf --resolutions 1080p --frames 20 --clients 8 16 32 48 --batch-sampler fused

# (4) parity lane + headline refresh (VERDICT #6)
FOVEAX_TPU_TESTS=1 timeout 1500 python -m pytest -m tpu tests/ -q
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 700 python bench.py
