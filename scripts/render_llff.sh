#!/bin/bash
# Render a camera path from a checkpoint (llff).
# Usage: SCENE=<scene> DATA_DIR=<data root> ./scripts/render_llff.sh

SCENE=${SCENE:-gardenvase}
EXPERIMENT=${EXPERIMENT:-llff}
DATA_DIR=${DATA_DIR:?set DATA_DIR to the dataset root}
CHECKPOINT_DIR=${CHECKPOINT_DIR:-results/"$EXPERIMENT"/"$SCENE"}

python -m render \
  --gin_configs=configs/llff_256.gin \
  --gin_bindings="Config.data_dir = '${DATA_DIR}/${SCENE}'" \
  --gin_bindings="Config.checkpoint_dir = '${CHECKPOINT_DIR}'" \
  --gin_bindings="Config.render_dir = '${CHECKPOINT_DIR}/render/'" \
  --gin_bindings="Config.render_path = True" \
  --gin_bindings="Config.render_path_frames = 480" \
  --gin_bindings="Config.render_video_fps = 60" \
  --logtostderr
