#!/bin/bash
# Probe the TPU tunnel until it is healthy, then run ONE round-4 batch
# (default: the Mosaic compile bisect).  Every unit inside the batch is
# bounded by its own `timeout`, so the watcher cannot hold the tunnel
# open-endedly when the round-end driver needs it.
#   FOVEAX_WATCH_BATCH   batch script to run once (default bisect)
#   FOVEAX_WATCH_PROBES  max probes before giving up (default 60)
#   FOVEAX_WATCH_LOG     log path (default /tmp/tpu_watch_r4.log)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
BATCH="${FOVEAX_WATCH_BATCH:-scripts/tpu_bisect_round4.sh}"
LOG="${FOVEAX_WATCH_LOG:-/tmp/tpu_watch_r4.log}"
: > "$LOG"
for i in $(seq 1 "${FOVEAX_WATCH_PROBES:-60}"); do
  echo "[watch] probe $i $(date -u +%H:%M:%S)" >> "$LOG"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
print('probe-ok', int((x*x).sum()), jax.default_backend())
assert jax.default_backend() != 'cpu'
" >> "$LOG" 2>&1; then
    echo "[watch] tunnel healthy, running $BATCH" >> "$LOG"
    bash "$BATCH" >> "$LOG" 2>&1
    echo "[watch] batch done rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 240
done
echo "[watch] gave up" >> "$LOG"
exit 1
