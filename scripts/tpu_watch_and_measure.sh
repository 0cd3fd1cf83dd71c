#!/bin/bash
# Probe the TPU tunnel until it is healthy, then run the round-3
# measurement batch exactly once.  Designed to run in the background
# during tunnel outages: each probe is bounded, probes are spaced out,
# and everything logs to /tmp/tpu_watch.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_watch.log
: > "$LOG"
for i in $(seq 1 "${FOVEAX_WATCH_PROBES:-60}"); do
  echo "[watch] probe $i $(date -u +%H:%M:%S)" >> "$LOG"
  if timeout 120 python -c "
import sys, jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
print('probe-ok', int((x*x).sum()), jax.default_backend())
# A CPU fallback must read as UNhealthy or CPU timings get recorded as
# TPU measurements (round-4 ADVICE).  The axon plugin registers its
# devices as platform 'tpu'.
sys.exit(jax.default_backend() != 'tpu')
" >> "$LOG" 2>&1; then
    echo "[watch] tunnel healthy, running batch" >> "$LOG"
    bash scripts/tpu_measure_round3.sh >> "$LOG" 2>&1
    echo "[watch] batch done rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 240
done
echo "[watch] gave up after 60 probes" >> "$LOG"
exit 1
