#!/usr/bin/env bash
# Shell launcher for training (reference UNet/train.sh role).
# Edit the variables below, or pass extra flags through: ./train.sh [--flag v ...]
set -euo pipefail

TRAIN_DATABASE="${TRAIN_DATABASE:-../data/train-HES.lmdb}"
TEST_DATABASE="${TEST_DATABASE:-../data/test-HES.lmdb}"
OUTPUT_DIR="${OUTPUT_DIR:-../output}"
BATCH_SIZE="${BATCH_SIZE:-4}"
NUMBER_CLASSES="${NUMBER_CLASSES:-2}"
LEARNING_RATE="${LEARNING_RATE:-3e-4}"
USE_AUGMENTATION="${USE_AUGMENTATION:-1}"
BALANCE_CLASSES="${BALANCE_CLASSES:-0}"
READER_COUNT="${READER_COUNT:-1}"

cd "$(dirname "$0")/.."
exec python -m tpuseg.cli.train \
  --train_database "${TRAIN_DATABASE}" \
  --test_database "${TEST_DATABASE}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size "${BATCH_SIZE}" \
  --number_classes "${NUMBER_CLASSES}" \
  --learning_rate "${LEARNING_RATE}" \
  --use_augmentation "${USE_AUGMENTATION}" \
  --balance_classes "${BALANCE_CLASSES}" \
  --reader_count "${READER_COUNT}" \
  "$@"
