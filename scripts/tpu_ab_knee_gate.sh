#!/bin/bash
# Same-window interleaved A/B of the validity gate + band widening on
# the BATCH (knee) path at 1080p x 240 clients — cross-window absolute
# rates drift ~2x, so the knee question ("did the gate move 240?") is
# only answerable with interleaved arms (BENCHMARKS.md measurement
# notes).  Fresh process per run.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

P="python -m foveax.cli.main perf --resolutions 1080p --batch-sampler fused --clients 240"
for rep in 1 2; do
  echo "== knee default rep$rep"
  timeout 900 $P
  echo "== knee nogate rep$rep"
  FOVEAX_SEGREDUCE_GATE=0 timeout 900 $P
  echo "== knee r3 rep$rep"
  FOVEAX_SEGREDUCE_WIDEN=0 FOVEAX_SEGREDUCE_GATE=0 timeout 900 $P
done
