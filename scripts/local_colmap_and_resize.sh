#!/bin/bash
# Offline COLMAP pose estimation + multiscale image resizing.
#
# Equivalent of the reference's scripts/local_colmap_and_resize.sh: runs the
# COLMAP binary (feature extraction -> exhaustive matching -> mapping) to
# produce the sparse/0 model our LLFF loader consumes, then generates
# images_2/, images_4/, images_8/ downsampled copies.
#
# Usage: ./scripts/local_colmap_and_resize.sh <DATASET_PATH> [CAMERA]
#   DATASET_PATH: directory with images in $DATASET_PATH/images/.
#   CAMERA: OPENCV (default, perspective) or OPENCV_FISHEYE.

set -e

USE_GPU=${USE_GPU:-0}
DATASET_PATH=$1
CAMERA=${2:-OPENCV}

if ! command -v colmap >/dev/null; then
  echo "colmap binary not found; install COLMAP to run pose estimation." >&2
  exit 1
fi

# Feature extraction.
colmap feature_extractor \
    --database_path "$DATASET_PATH"/database.db \
    --image_path "$DATASET_PATH"/images \
    --ImageReader.single_camera 1 \
    --ImageReader.camera_model "$CAMERA" \
    --SiftExtraction.use_gpu "$USE_GPU"

# Feature matching (use vocab_tree_matcher for > 500 images).
colmap exhaustive_matcher \
    --database_path "$DATASET_PATH"/database.db \
    --SiftMatching.use_gpu "$USE_GPU"

# Bundle adjustment; tighter tolerance speeds up convergence.
mkdir -p "$DATASET_PATH"/sparse
colmap mapper \
    --database_path "$DATASET_PATH"/database.db \
    --image_path "$DATASET_PATH"/images \
    --output_path "$DATASET_PATH"/sparse \
    --Mapper.ba_global_function_tolerance=0.000001

# Multiscale image pyramid. Uses ImageMagick if present, else PIL.
for factor in 2 4 8; do
  out="$DATASET_PATH/images_${factor}"
  mkdir -p "$out"
  if command -v mogrify >/dev/null; then
    cp "$DATASET_PATH"/images/* "$out/"
    pushd "$out" >/dev/null
    mogrify -resize $((100 / factor))% *
    popd >/dev/null
  else
    python - "$DATASET_PATH/images" "$out" "$factor" <<'PYEOF'
import os, sys
from PIL import Image
src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
for name in os.listdir(src):
    img = Image.open(os.path.join(src, name))
    img = img.resize((img.width // factor, img.height // factor),
                     Image.LANCZOS)
    img.save(os.path.join(dst, name))
PYEOF
  fi
done
