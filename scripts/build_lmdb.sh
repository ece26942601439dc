#!/usr/bin/env bash
# Shell launcher for dataset construction (reference UNet/build_lmdb.sh role).
set -euo pipefail

IMAGE_FOLDER="${IMAGE_FOLDER:-../data/images}"
MASK_FOLDER="${MASK_FOLDER:-../data/masks}"
OUTPUT_FOLDER="${OUTPUT_FOLDER:-../data}"
DATASET_NAME="${DATASET_NAME:-HES}"
TRAIN_FRACTION="${TRAIN_FRACTION:-0.8}"
IMAGE_FORMAT="${IMAGE_FORMAT:-tif}"
USE_TILING="${USE_TILING:-0}"
TILE_SIZE="${TILE_SIZE:-512}"

cd "$(dirname "$0")/.."
exec python -m tpuseg.cli.build_lmdb \
  --image_folder "${IMAGE_FOLDER}" \
  --mask_folder "${MASK_FOLDER}" \
  --output_folder "${OUTPUT_FOLDER}" \
  --dataset_name "${DATASET_NAME}" \
  --train_fraction "${TRAIN_FRACTION}" \
  --image_format "${IMAGE_FORMAT}" \
  --use_tiling "${USE_TILING}" \
  --tile_size "${TILE_SIZE}" \
  "$@"
