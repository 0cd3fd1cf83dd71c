#!/bin/bash
# Round-5 measurement batch (run under tpu_watch_round5.sh, which
# retries the whole batch until it completes in one healthy stretch):
#   0. on-chip fused parity — GATES everything below (a batch must never
#      publish headline numbers for a kernel configuration whose parity
#      just failed: round-4 ADVICE item 3)
#   1. pure-stream HBM ceiling microbench (fresh process)
#   2. 16K stage costs + the unwarp/sampler decompositions
#   3. full-path refresh at 4k/8k/16k
#   4. batched-sampler knee points at 4K and 8K (round-4 only measured
#      1080p) + the 1080p 240/256 bracket re-check + grid-vs-map A/B
#   5. bench.py headline
#   6. optional MXU int8-dot A/B tail (non-fatal)
# Each step is timeout-bounded AND preceded by a fast health probe: a
# mid-batch tunnel wedge exits 1 immediately (the watcher resumes
# probing) instead of burning every remaining step's timeout.  Completed
# steps leave a /tmp/r5_<name>.done stamp so a retry after a mid-batch
# wedge RESUMES instead of re-measuring (the wedge cadence on 2026-08-21
# was ~20-30 min of health between multi-hour outages — a from-scratch
# retry can starve the tail steps forever).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

probe() {
  # Two attempts with a cool-down: a probe right after another process
  # detached sometimes fails transiently (observed 01:51Z, 03:20Z —
  # watcher probe-ok followed by an immediate step-probe failure wasted
  # the whole window), while a second attach 20 s later succeeds.
  for _a in 1 2; do
    timeout 150 python -c "
import sys, jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
ok = int((x*x).sum()) == 690880 and jax.default_backend() == 'tpu'
sys.exit(0 if ok else 1)
" && return 0
    sleep 20
  done
  echo "WEDGED: aborting batch for re-probe"
  exit 1
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  [ -f "/tmp/r5_${name}.done" ] && return 0
  probe
  timeout "$to" "$@" || exit 1
  touch "/tmp/r5_${name}.done"
}

# Gate on parity, but distinguish a TUNNEL WEDGE from a genuine test
# failure: a wedged pytest hangs with no output and is killed by
# `timeout` (rc=124) — that must re-probe (rc 1), not permanently brand
# the kernels broken (rc 2).  Observed 2026-08-21: a zero-output 900 s
# hang right after a passing probe was mislabeled PARITY-FAILED.
if [ ! -f /tmp/r5_parity.done ]; then
  probe
  FOVEAX_TPU_TESTS=1 timeout 900 python -m pytest tests/test_tpu_parity.py \
    -q -m tpu -k fused -x
  rc=$?
  if [ $rc -eq 124 ]; then echo "WEDGED during parity; re-probe"; exit 1; fi
  if [ $rc -ne 0 ]; then echo "PARITY-FAILED: batch aborted"; exit 2; fi
  touch /tmp/r5_parity.done
fi

step hbm      1500 python scripts/hbm_stream_bench.py --iters 48 --mb 128
step st16f     900 python scripts/stage_bench.py --resolutions 16k --stages fused
step st16u     900 python scripts/stage_bench.py --resolutions 16k --stages unwarp --precision fused
# Headline-bearing steps FIRST (healthy windows are ~20-30 min between
# multi-hour wedges; the per-pass diagnostics moved to the tail so a
# starved batch still refreshes perf/knee/bench before anything else).
# Prewarm: the round-5 kernel edits invalidated the persistent-cache
# entries for bench's 4K candidate shapes (observed 02:03Z: the probe
# child died at its 240 s bound still compiling the FIRST candidate).
# Running the probe child alone with a generous bound populates the
# cache (15-40 s per remote compile x up to 8 traces); the bench step
# after it then probes from cache in seconds.
step prewarm  2000 python bench.py --fused-probe
step bench    1300 env FOVEAX_BENCH_FUSED_TIMEOUT=240 python bench.py
step perf     1500 python -m foveax.cli.main perf --resolutions 4k 8k 16k
step knee4k   1500 python -m foveax.cli.main perf --resolutions 4k --clients 8 16 32 48 64 --batch-sampler fused
step knee8k   1200 python -m foveax.cli.main perf --resolutions 8k --clients 4 8 12 16 --batch-sampler fused
step knee1080  900 python -m foveax.cli.main perf --resolutions 1080p --clients 64 240 256 320 --batch-sampler fused
step kneemap   900 env FOVEAX_BATCH_GRID=0 python -m foveax.cli.main perf --resolutions 1080p --clients 64 240 --batch-sampler fused
step udiag2   1500 python scripts/unwarp_diag2.py --res 16k --iters 10
step udiag3   1500 python scripts/unwarp_diag3.py --res 16k --iters 10
step sdiag    1500 python scripts/sampler_diag.py --res 16k --iters 10
echo "BATCH-COMPLETE"

# --- optional tail: MXU int8-dot A/B (round 5).  Mosaic s8-dot support
# is unverified on this chip, so every step is NON-fatal (a failure
# logs a marker; the batch is already complete above).  A tunnel wedge
# here exits 0 — the mandatory results are in.
sprobe() {
  for _a in 1 2; do
    timeout 150 python -c "
import sys, jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
ok = int((x*x).sum()) == 690880 and jax.default_backend() == 'tpu'
sys.exit(0 if ok else 1)
" && return 0
    sleep 20
  done
  echo "WEDGED in optional int8 tail; batch already complete"
  exit 0
}

ostep() {  # ostep <name> <timeout_s> <marker> <cmd...>
  local name=$1 to=$2 marker=$3; shift 3
  [ -f "/tmp/r5_${name}.done" ] && return 0
  sprobe
  if timeout "$to" "$@"; then touch "/tmp/r5_${name}.done"; else echo "$marker"; fi
}

ostep i8par 900 INT8-PARITY-FAILED env FOVEAX_SEGREDUCE_INT8=1 FOVEAX_UNWARP_INT8=1 FOVEAX_TPU_TESTS=1 \
  python -m pytest tests/test_tpu_parity.py -q -m tpu -k fused -x
ostep i8samp 1200 INT8-SAMPLER-FAILED env FOVEAX_SEGREDUCE_INT8=1 \
  python scripts/stage_bench.py --resolutions 4k 16k --stages fused
ostep i8unw 1200 INT8-UNWARP-FAILED env FOVEAX_UNWARP_INT8=1 \
  python scripts/stage_bench.py --resolutions 4k 16k --stages unwarp --precision fused

# xy pass order (round-5 dot-FLOP lever): on-chip parity first, then the
# stage A/B, then the combined xy+int8 point.
ostep xypar 900 XY-PARITY-FAILED env FOVEAX_UNWARP_ORDER=xy FOVEAX_TPU_TESTS=1 \
  python -m pytest tests/test_tpu_parity.py -q -m tpu -k "fused and unwarp" -x
ostep xyunw 1200 XY-UNWARP-FAILED env FOVEAX_UNWARP_ORDER=xy \
  python scripts/stage_bench.py --resolutions 4k 16k --stages unwarp --precision fused
ostep xyi8unw 1200 XY-INT8-UNWARP-FAILED env FOVEAX_UNWARP_ORDER=xy FOVEAX_UNWARP_INT8=1 \
  python scripts/stage_bench.py --resolutions 4k 16k --stages unwarp --precision fused

# Scan-kernel budget decomposition (closes the "scan sits 5x above its
# byte floor" question from the delivered-ceiling section with a
# measured attribution: dots vs column scan vs cast/DMA floor).
ostep scandiag 1500 SCAN-DIAG-FAILED python scripts/scan_diag.py --res 16k --iters 10
ostep scandiag8 1200 SCAN-DIAG8-FAILED python scripts/scan_diag.py --res 8k --iters 10

# int8 triangular-scan A/B (FOVEAX_SCAN_INT8): on-chip parity, then the
# sat stage at 8k/16k with the knob on (baseline sat numbers come from
# the perf/stage steps above).
ostep scani8par 900 SCAN-INT8-PARITY-FAILED env FOVEAX_SCAN_INT8=1 FOVEAX_TPU_TESTS=1 \
  python -m pytest tests/test_tpu_parity.py -q -m tpu -k "sat or scan" -x
ostep scani8 1200 SCAN-INT8-FAILED env FOVEAX_SCAN_INT8=1 \
  python scripts/stage_bench.py --resolutions 8k 16k --stages sat
ostep scanbase 1200 SCAN-BASE-FAILED python scripts/stage_bench.py --resolutions 8k 16k --stages sat
echo "INT8-TAIL-COMPLETE"
