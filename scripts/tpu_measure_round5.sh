#!/bin/bash
# Round-5 measurement batch (run under tpu_watch_round5.sh, which
# retries the whole batch until it completes in one healthy stretch):
#   0. on-chip fused parity — GATES everything below (a batch must never
#      publish headline numbers for a kernel configuration whose parity
#      just failed: round-4 ADVICE item 3)
#   1. pure-stream HBM ceiling microbench (fresh process)
#   2. 16K stage costs + the unwarp decompositions in the SAME window
#   3. full-path refresh at 4k/8k/16k
#   4. batched-sampler knee points at 4K and 8K (round-4 only measured
#      1080p) + the 1080p 240/256 bracket re-check
#   5. bench.py headline
# Each step is timeout-bounded AND preceded by a fast health probe: a
# mid-batch tunnel wedge exits 1 immediately (the watcher resumes
# probing) instead of burning every remaining step's timeout.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

probe() {
  timeout 150 python -c "
import sys, jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
ok = int((x*x).sum()) == 690880 and jax.default_backend() == 'tpu'
sys.exit(0 if ok else 1)
" || { echo "WEDGED: aborting batch for re-probe"; exit 1; }
}

probe
FOVEAX_TPU_TESTS=1 timeout 900 python -m pytest tests/test_tpu_parity.py \
  -q -m tpu -k fused -x || { echo "PARITY-FAILED: batch aborted"; exit 2; }

probe
timeout 1500 python scripts/hbm_stream_bench.py --iters 48 --mb 128 || exit 1

probe
timeout 900 python scripts/stage_bench.py --resolutions 16k --stages fused \
  || exit 1
probe
timeout 900 python scripts/stage_bench.py --resolutions 16k --stages unwarp \
  --precision fused || exit 1
probe
timeout 1500 python scripts/unwarp_diag2.py --res 16k --iters 10 || exit 1
probe
timeout 1500 python scripts/unwarp_diag3.py --res 16k --iters 10 || exit 1
probe
timeout 1500 python scripts/sampler_diag.py --res 16k --iters 10 || exit 1

probe
timeout 1500 python -m foveax.cli.main perf --resolutions 4k 8k 16k || exit 1

probe
timeout 1500 python -m foveax.cli.main perf --resolutions 4k \
  --clients 8 16 32 48 64 --batch-sampler fused || exit 1
probe
timeout 1200 python -m foveax.cli.main perf --resolutions 8k \
  --clients 4 8 12 16 --batch-sampler fused || exit 1
probe
timeout 900 python -m foveax.cli.main perf --resolutions 1080p \
  --clients 64 240 256 320 --batch-sampler fused || exit 1
probe
FOVEAX_BATCH_GRID=0 timeout 900 python -m foveax.cli.main perf \
  --resolutions 1080p --clients 64 240 --batch-sampler fused || exit 1

probe
FOVEAX_BENCH_FUSED_TIMEOUT=240 timeout 1300 python bench.py || exit 1
echo "BATCH-COMPLETE"

# --- optional tail: MXU int8-dot A/B (round 5).  Mosaic s8-dot support
# is unverified on this chip, so every step is NON-fatal (a failure
# logs a marker; the batch is already complete above).  A tunnel wedge
# here exits 0 — the mandatory results are in.
sprobe() {
  timeout 150 python -c "
import sys, jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
ok = int((x*x).sum()) == 690880 and jax.default_backend() == 'tpu'
sys.exit(0 if ok else 1)
" || { echo "WEDGED in optional int8 tail; batch already complete"; exit 0; }
}

sprobe
FOVEAX_SEGREDUCE_INT8=1 FOVEAX_UNWARP_INT8=1 FOVEAX_TPU_TESTS=1 \
  timeout 900 python -m pytest tests/test_tpu_parity.py -q -m tpu -k fused -x \
  || echo "INT8-PARITY-FAILED"
sprobe
FOVEAX_SEGREDUCE_INT8=1 timeout 1200 python scripts/stage_bench.py \
  --resolutions 4k 16k --stages fused || echo "INT8-SAMPLER-FAILED"
sprobe
FOVEAX_UNWARP_INT8=1 timeout 1200 python scripts/stage_bench.py \
  --resolutions 4k 16k --stages unwarp --precision fused \
  || echo "INT8-UNWARP-FAILED"
echo "INT8-TAIL-COMPLETE"
