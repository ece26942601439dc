#!/usr/bin/env bash
# Shell launcher for inference (reference UNet/inference.sh role).
set -euo pipefail

CHECKPOINT_FILEPATH="${CHECKPOINT_FILEPATH:-../output/checkpoint/ckpt}"
IMAGE_FOLDER="${IMAGE_FOLDER:-../data/images}"
OUTPUT_FOLDER="${OUTPUT_FOLDER:-../inference_output}"
NUMBER_CLASSES="${NUMBER_CLASSES:-2}"
NUMBER_CHANNELS="${NUMBER_CHANNELS:-1}"
IMAGE_FORMAT="${IMAGE_FORMAT:-tif}"

cd "$(dirname "$0")/.."
exec python -m tpuseg.cli.inference \
  --checkpoint_filepath "${CHECKPOINT_FILEPATH}" \
  --image_folder "${IMAGE_FOLDER}" \
  --output_folder "${OUTPUT_FOLDER}" \
  --number_classes "${NUMBER_CLASSES}" \
  --number_channels "${NUMBER_CHANNELS}" \
  --image_format "${IMAGE_FORMAT}" \
  "$@"
