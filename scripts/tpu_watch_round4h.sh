#!/bin/bash
# Probe the TPU tunnel until healthy, then run measurement batch H once.
# Bounded probes, background-friendly; logs to /tmp/tpu_watch_r4h.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_watch_r4h.log
: > "$LOG"
for i in $(seq 1 "${FOVEAX_WATCH_PROBES:-12}"); do
  echo "[watch] probe $i $(date -u +%H:%M:%S)" >> "$LOG"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
print('probe-ok', int((x*x).sum()), jax.default_backend())
" >> "$LOG" 2>&1; then
    echo "[watch] tunnel healthy, running batch H" >> "$LOG"
    bash scripts/tpu_measure_round4h.sh >> "$LOG" 2>&1
    echo "[watch] batch done rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 60
done
echo "[watch] gave up" >> "$LOG"
exit 1
