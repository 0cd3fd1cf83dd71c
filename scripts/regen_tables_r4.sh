#!/bin/bash
# Round-4 table regeneration with the SSIM metric family (VERDICT r3
# item 7's "tables regenerated" clause).  CPU-forced so the TPU tunnel
# stays free for the round-4c measurement batch; device math is within
# the <=1 LSB parity contract of the chip, and the ladder is encode-
# (host-)dominated either way.  Output: /tmp/regen_tables_r4.log.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# Quality tables (1080p, 20 frames, fixed central gaze) — all four
# content regimes, logrect vs logpolar.
for pat in natural natural1f photo hostile; do
  timeout 1200 python -m foveax.cli.main --platform cpu quality \
    "synthetic://1920x1080/20#$pat" --max-frames 20 \
    --techniques logrect logpolar
done

# Bitrate ladders.  hostile + natural: 20 frames, fixed central gaze
# (round-2/3 protocol); natural1f + photo: 60 frames, moving
# pursuit+saccade gaze (the paper's regime).
timeout 2400 python -m foveax.cli.main --platform cpu ladder \
  "synthetic://1920x1080/20#hostile" --max-frames 20
timeout 2400 python -m foveax.cli.main --platform cpu ladder \
  "synthetic://1920x1080/20#natural" --max-frames 20
timeout 4800 python -m foveax.cli.main --platform cpu ladder \
  "synthetic://1920x1080/60#natural1f" --max-frames 60 \
  --gaze-trace synthetic
timeout 4800 python -m foveax.cli.main --platform cpu ladder \
  "synthetic://1920x1080/60#photo" --max-frames 60 \
  --gaze-trace synthetic
