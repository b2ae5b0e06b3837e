#!/bin/bash
# Round-5 TPU job queue: ONE job at a time on the single axon chip
# (a second process connecting to the tunnel can deadlock/crash the
# holder — see .claude/skills/verify/SKILL.md).  Each job logs to
# /tmp/r5_<name>.log; the queue appends a status line to /tmp/r5_queue.status.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
STATUS=/tmp/r5_queue.status
: > "$STATUS"

run() {
  local name="$1"; shift
  echo "START $name $(date +%H:%M:%S)" >> "$STATUS"
  timeout "$JOB_TIMEOUT" "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  echo "DONE  $name rc=$rc $(date +%H:%M:%S)" >> "$STATUS"
}

# 1. Verify drives for the in-flight diff (render_many + int8 hybrid).
JOB_TIMEOUT=1800 run render_many python scripts/render_many_probe.py --sizes 64,128 --k 8 --frames 16
JOB_TIMEOUT=3600 run int8_hybrid python scripts/int8_hybrid_probe.py

# 2. Full bench with the new MFU + refnerf/raw A/B fields (VERDICT #1a/#2).
JOB_TIMEOUT=7200 run bench python bench.py

# 3. Ref-NeRF trajectory head-to-head (VERDICT #3).
JOB_TIMEOUT=14400 run h2h_refnerf python scripts/head_to_head.py \
  --arch refnerf --steps 5000 --eval_every 500 --out docs

# 4. RobustNeRF trajectory head-to-head (VERDICT #4).
JOB_TIMEOUT=14400 run h2h_robust python scripts/head_to_head.py \
  --arch robust --steps 3000 --eval_every 500 --out docs

# 5. Clean scatter flagship arm re-run (VERDICT #5).
JOB_TIMEOUT=14400 run h2h_scatter python scripts/head_to_head.py \
  --arch flagship --loader dummy_scatter --steps 10000 \
  --eval_every 1000 --eval_frames 8 --out docs

echo "ALL DONE $(date +%H:%M:%S)" >> "$STATUS"
