#!/bin/bash
# Train on Ref-NeRF on Shiny Blender.
# Usage: SCENE=<scene> DATA_DIR=<data root> ./scripts/train_shinyblender.sh

SCENE=${SCENE:-gardenvase}
EXPERIMENT=${EXPERIMENT:-shinyblender}
DATA_DIR=${DATA_DIR:?set DATA_DIR to the dataset root}
CHECKPOINT_DIR=${CHECKPOINT_DIR:-results/"$EXPERIMENT"/"$SCENE"}

python -m train \
  --gin_configs=configs/blender_refnerf.gin \
  --gin_bindings="Config.data_dir = '${DATA_DIR}/${SCENE}'" \
  --gin_bindings="Config.checkpoint_dir = '${CHECKPOINT_DIR}'" \
  --logtostderr
