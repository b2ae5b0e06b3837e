#!/bin/bash
# Train on mip-NeRF 360 unbounded scenes.
# Usage: SCENE=<scene> DATA_DIR=<data root> ./scripts/train_360.sh

SCENE=${SCENE:-gardenvase}
EXPERIMENT=${EXPERIMENT:-360}
DATA_DIR=${DATA_DIR:?set DATA_DIR to the dataset root}
CHECKPOINT_DIR=${CHECKPOINT_DIR:-results/"$EXPERIMENT"/"$SCENE"}

python -m train \
  --gin_configs=configs/360.gin \
  --gin_bindings="Config.data_dir = '${DATA_DIR}/${SCENE}'" \
  --gin_bindings="Config.checkpoint_dir = '${CHECKPOINT_DIR}'" \
  --logtostderr
