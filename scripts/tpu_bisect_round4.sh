#!/bin/bash
# Round-4 Mosaic compile bisect: run each compile unit in its own
# killable process under timeout, logging everything.  Ordered by
# information value: the round-3 mysteries first (4K sampler split by
# pass, >=8K unwarp), then the 16K units goal #2 needs, then a
# persistent-cache recheck (a second identical unit should compile in
# seconds if the cache covers Mosaic lowerings).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
B=scripts/compile_bisect.py

timeout 420 python $B --unit samp_y:1080p   # sanity: known-compiling shape
timeout 900 python $B --unit samp_y:4k
timeout 900 python $B --unit samp_x:4k
timeout 900 python $B --unit unwarp:8k
timeout 900 python $B --unit samp_y:16k
timeout 900 python $B --unit samp_x:16k
timeout 900 python $B --unit unwarp:16k
timeout 900 python $B --unit samp:4k
timeout 420 python $B --unit samp_y:4k      # cache recheck (same unit)
