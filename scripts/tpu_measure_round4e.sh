#!/bin/bash
# Round-4 measurement batch E: one bench.py headline confirmation with
# the new empty-probe retry (bench.py re-probes device health and
# retries a wedged Pallas-probe window once instead of silently falling
# back to the XLA floor — the batch-D failure mode), plus one composed
# perf pass through the autos for the record.  Short by design: the
# watcher must not hold the tunnel when the round-end driver runs.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

# Headline with retry headroom: probe 240 + health 300 + retry 240 +
# device wait + floor fits inside 1300.
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py

# Composed-path autos, one invocation for within-run comparability.
timeout 580 python -m foveax.cli.main perf --resolutions 1080p 4k 8k 16k --frames 15
