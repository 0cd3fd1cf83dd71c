#!/bin/bash
# Wait for the batch-G watcher to exit, then probe the tunnel until
# healthy and run the geometry A/B exactly once.  Logs to
# /tmp/tpu_ab_r4g.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_ab_r4g.log
: > "$LOG"
PREV_PID="$(cat /tmp/watch_r4g.pid 2>/dev/null)"
while [ -n "$PREV_PID" ] && kill -0 "$PREV_PID" 2>/dev/null; do
  echo "[chain] batch G still running (pid $PREV_PID) $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 120
done
for i in $(seq 1 "${FOVEAX_WATCH_PROBES:-60}"); do
  echo "[chain] probe $i $(date -u +%H:%M:%S)" >> "$LOG"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
print('probe-ok', int((x*x).sum()), jax.default_backend())
" >> "$LOG" 2>&1; then
    echo "[chain] tunnel healthy, running A/B" >> "$LOG"
    bash scripts/tpu_ab_round4g.sh >> "$LOG" 2>&1
    echo "[chain] A/B done rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 180
done
echo "[chain] gave up" >> "$LOG"
exit 1
