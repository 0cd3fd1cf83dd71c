#!/bin/bash
# Probe the TPU tunnel until healthy, then run the round-5 batch once.
# Bounded probes; logs to /tmp/tpu_watch_r5.log.  The probe REQUIRES the
# accelerator backend — a CPU fallback must read as unhealthy, or CPU
# timings would be recorded as TPU measurements (round-4 ADVICE item 2;
# note the axon plugin registers its devices as platform 'tpu', so the
# assert is on 'tpu', not 'axon').
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${FOVEAX_WATCH_LOG:-/tmp/tpu_watch_r5.log}
BATCH=${FOVEAX_WATCH_BATCH:-scripts/tpu_measure_round5.sh}
# APPEND, never truncate: a restart must not wipe a previous attempt's
# recorded measurements (lost the window-2 HBM table this way once).
echo "[watch] ==== new watcher run $(date -u +%F" "%H:%M:%S) ====" >> "$LOG"
for i in $(seq 1 "${FOVEAX_WATCH_PROBES:-40}"); do
  echo "[watch] probe $i $(date -u +%H:%M:%S)" >> "$LOG"
  if timeout 120 python -c "
import sys, jax, jax.numpy as jnp
x = jnp.arange(128, dtype=jnp.int32)
print('probe-ok', int((x*x).sum()), jax.default_backend())
sys.exit(jax.default_backend() != 'tpu')
" >> "$LOG" 2>&1; then
    echo "[watch] tunnel healthy, running batch" >> "$LOG"
    bash "$BATCH" >> "$LOG" 2>&1
    rc=$?
    echo "[watch] batch done rc=$rc" >> "$LOG"
    # rc 0 = complete; rc 2 = parity failed (do NOT retry — the numbers
    # would be for a broken kernel config); rc 1 = wedged mid-batch, so
    # keep probing and retry the whole batch in the next healthy window.
    [ $rc -ne 1 ] && exit $rc
    echo "[watch] batch wedged; resuming probes" >> "$LOG"
  fi
  # 90 s cadence: with ~20-min healthy windows between wedges, the old
  # 240 s sleep + 120 s probe bound could burn a third of a window just
  # noticing it opened.
  sleep 90
done
echo "[watch] gave up" >> "$LOG"
exit 1
