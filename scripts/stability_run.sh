#!/bin/bash
# Long-horizon flagship stability run (VERDICT round-2 item 5).
#
# One 25k-step 360.gin training run on the real chip: synthetic unbounded
# scene (dummy_unbounded), fully device-resident data plane with the
# culling protocol (warmup/refresh/capacity-ladder gate) running inside the
# scan, bf16 trunk, in-train test renders every 5k steps.  The run is
# KILLED once mid-flight after the 10k checkpoint and restarted with the
# identical command to prove checkpoint-resume continuity, then eval.py
# scores the final checkpoint.
#
# Usage: scripts/stability_run.sh /path/to/ckpt_dir
set -u
CKPT=${1:?checkpoint dir}
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$CKPT"

run_train() {
  # exec: the function body REPLACES its (sub)shell, so backgrounding
  # run_train makes $! the python PID itself.  Without it, phase 1's kill
  # hits only the wrapper subshell and the trainer keeps running —
  # overlapping phase 2 on the chip and interleaving checkpoints.
  PYTHONPATH="$REPO:${PYTHONPATH:-}" exec python "$REPO/train.py" \
    --gin_configs="$REPO/configs/360.gin" \
    --gin_bindings="Config.dataset_loader='dummy_unbounded'" \
    --gin_bindings="Config.data_dir=''" \
    --gin_bindings="Config.checkpoint_dir='$CKPT'" \
    --gin_bindings="Config.max_steps=25000" \
    --gin_bindings="Config.batch_size=4096" \
    --gin_bindings="Config.print_every=500" \
    --gin_bindings="Config.checkpoint_every=5000" \
    --gin_bindings="Config.train_render_every=5000" \
    --gin_bindings="Config.device_data_plane=True" \
    --gin_bindings="Config.steps_per_jit_call=50" \
    --gin_bindings="Config.occupancy_culling=True" \
    --gin_bindings="Config.occupancy_capacity_ladder=(0.33,0.5,0.67)" \
    --gin_bindings="Config.occupancy_warmup_steps=1000" \
    --gin_bindings="NerfMLP.trunk_dtype='bfloat16'" \
    --gin_bindings="PropMLP.trunk_dtype='bfloat16'"
}

# Phase 1: run in the background, kill after the 10k checkpoint lands
# (kill by PID, never by pattern).
run_train > "$CKPT/train_phase1.log" 2>&1 &
TRAIN_PID=$!
echo "phase 1 pid $TRAIN_PID"
while true; do
  sleep 30
  if ! kill -0 "$TRAIN_PID" 2>/dev/null; then
    echo "phase 1 exited on its own; see $CKPT/train_phase1.log"; break
  fi
  if ls -d "$CKPT"/10000 >/dev/null 2>&1 && \
     grep -q "^ *12[0-9][0-9][0-9]/25000" "$CKPT/train_phase1.log"; then
    echo "killing phase 1 at ~12k steps (post-10k checkpoint)"
    kill "$TRAIN_PID"; wait "$TRAIN_PID" 2>/dev/null
    break
  fi
done

# Phase 2: identical command; must resume from the 10k checkpoint.
# (Subshell: run_train execs, and the script must survive phase 2.)
( run_train > "$CKPT/train_phase2.log" 2>&1 )
echo "phase 2 rc=$?"

# Final full-test-set eval through eval.py (writes metric_*_25000.txt).
PYTHONPATH="$REPO:${PYTHONPATH:-}" python "$REPO/eval.py" \
  --gin_configs="$REPO/configs/360.gin" \
  --gin_bindings="Config.dataset_loader='dummy_unbounded'" \
  --gin_bindings="Config.data_dir=''" \
  --gin_bindings="Config.checkpoint_dir='$CKPT'" \
  --gin_bindings="Config.max_steps=25000" \
  --gin_bindings="Config.batch_size=4096" \
  --gin_bindings="Config.eval_only_once=True" \
  --gin_bindings="NerfMLP.trunk_dtype='bfloat16'" \
  --gin_bindings="PropMLP.trunk_dtype='bfloat16'" \
  > "$CKPT/eval_final.log" 2>&1
echo "eval rc=$?"
grep -h "psnr\|ssim" "$CKPT"/metric_* 2>/dev/null | head
