#!/bin/bash
# Round-5 TPU queue, phase 2 (see r5_queue.sh for the serialization rule).
# NOTHING else may run while this does — even JAX_PLATFORMS=cpu python
# registers the axon plugin and has wedged the chip holder before.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
STATUS=/tmp/r5_queue2.status
: > "$STATUS"

run() {
  local name="$1"; shift
  echo "START $name $(date +%H:%M:%S)" >> "$STATUS"
  timeout "$JOB_TIMEOUT" "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  echo "DONE  $name rc=$rc $(date +%H:%M:%S)" >> "$STATUS"
}

# 1. Clean scatter flagship arm re-run (VERDICT #5) — first, while the
#    host is guaranteed quiet.
JOB_TIMEOUT=10800 run h2h_scatter python scripts/head_to_head.py \
  --arch flagship --loader dummy_scatter --steps 10000 \
  --eval_every 1000 --eval_frames 8 --out docs

# 2. Full bench: MFU + refnerf/raw A/Bs (np.math + IDE substitution in).
JOB_TIMEOUT=7200 run bench python bench.py

# 3. Ref-NeRF trajectory head-to-head (VERDICT #3), IDE-substituted ref.
JOB_TIMEOUT=14400 run h2h_refnerf python scripts/head_to_head.py \
  --arch refnerf --steps 5000 --eval_every 500 --out docs

# 4. RobustNeRF device-pace A/B (annotates the h2h wall split).
JOB_TIMEOUT=5400 run robust_pace python scripts/robust_step_probe.py

echo "ALL DONE $(date +%H:%M:%S)" >> "$STATUS"
