#!/bin/bash
# Round-4 TPU-held streaming re-attempt WITH the readback guard active
# (VERDICT r3 #4 "Done" criterion): server holds the real device, client
# forces CPU, 60 frames at 1080p over the h264 wire.  A mid-stream
# tunnel wedge now degrades to skipped frames (rb_skipped in the server
# stats line) instead of a hung channel; --readback-deadline 30 is far
# above a healthy readback (~30 ms relay floor) and far below the wedge
# signature (>300 s).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/foveax_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
timeout 900 python scripts/two_process_demo.py \
  --frames 60 --resolution 1920x1080 --server-device --wire-codec h264 \
  --server-args "--readback-deadline 30"
