#!/bin/bash
# Round-4 measurement batch C (after the perf-CLI auto fix, commit
# 661b51a): batch B's "perf through the autos" run measured the CLI's
# STALE round-3 policy (direct <=4K / SAT above), not the flipped
# pipeline policy — the CLI had its own auto split.  This batch
# validates that the fixed autos deliver the fused-pair numbers with
# no explicit flags anywhere: (1) full-path perf at all four
# resolutions; (2) the client sweep with --batch-sampler auto (should
# match batch B's explicit fused curve); (3) one more bench.py for
# headline consistency; (4) a short TPU-held serve demo now that the
# serve tick's batch auto resolves to the fused sampler.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

# (1) composed path through the FIXED autos (expect ~1029/220/56 fps)
timeout 580 python -m foveax.cli.main perf --resolutions 1080p 4k 8k 16k --frames 15

# (2) auto batch sampler (expect the fused curve: ~25 ms at 192)
timeout 580 python -m foveax.cli.main perf --resolutions 1080p --frames 20 \
  --clients 32 128 192 256

# (3) headline consistency
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 700 python bench.py

# (4) TPU-held serve with the fused batch auto + readback guard
timeout 600 python scripts/two_process_demo.py --frames 30 \
  --resolution 1920x1080 --server-device --wire-codec h264 \
  --server-args '--readback-deadline 30'
