#!/bin/bash
# Round-4 measurement batch F: validate the restructured bench probe.
# Batches C/D/E all lost the Pallas-probe window while the perf CLI ran
# the same fused kernels fine seconds later — root cause: the probe
# CHILD ran wait_for_device(), whose per-probe subprocesses (a third
# process layer on a one-process tunnel) can eat the child's entire
# kill bound under a flapping attach.  The child now gates the backend
# in-process and narrates progress to stderr, so a killed probe says
# where it hung.  Two bench runs back to back: consistency + the probe
# diagnosis lines.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py
