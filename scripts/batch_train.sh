#!/usr/bin/env bash
# Cluster batch job for training (reference UNet/sbatch_train.sh role,
# retargeted from Slurm+GPU to a TPU VM: one host drives all local chips via
# the SPMD mesh, so no per-GPU env vars are needed).
#
# Usage under Slurm:   sbatch --ntasks=1 --cpus-per-task=96 batch_train.sh
# Usage standalone:    ./batch_train.sh
set -euo pipefail

TRAIN_DATABASE="${TRAIN_DATABASE:?set TRAIN_DATABASE}"
TEST_DATABASE="${TEST_DATABASE:?set TEST_DATABASE}"
OUTPUT_DIR="${OUTPUT_DIR:-./results-$(date +%Y%m%dT%H%M%S)}"
BATCH_SIZE="${BATCH_SIZE:-8}"           # per chip
READER_COUNT="${READER_COUNT:-2}"       # per chip

mkdir -p "${OUTPUT_DIR}"

# exit cleanly if the scheduler sends TERM (reference sbatch_train.sh:40-47)
trap 'echo "TERM received, exiting"; exit 0' TERM

# stage databases to node-local scratch when available (sbatch_train.sh:59-66)
if [[ -n "${SLURM_JOB_ID:-}" && -d /scratch ]]; then
  SCRATCH="/scratch/${SLURM_JOB_ID}"
  mkdir -p "${SCRATCH}"
  cp -r "${TRAIN_DATABASE}" "${SCRATCH}/"
  cp -r "${TEST_DATABASE}" "${SCRATCH}/"
  TRAIN_DATABASE="${SCRATCH}/$(basename "${TRAIN_DATABASE}")"
  TEST_DATABASE="${SCRATCH}/$(basename "${TEST_DATABASE}")"
fi

# snapshot the source into the results dir for reproducibility (sbatch_train.sh:72-73)
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
git -C "${REPO_DIR}" rev-parse HEAD > "${OUTPUT_DIR}/git_commit.txt" 2>/dev/null || true
tar -C "${REPO_DIR}" -czf "${OUTPUT_DIR}/source_snapshot.tar.gz" tpuseg scripts 2>/dev/null || true

cd "${REPO_DIR}"
python -m tpuseg.cli.train \
  --train_database "${TRAIN_DATABASE}" \
  --test_database "${TEST_DATABASE}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size "${BATCH_SIZE}" \
  --reader_count "${READER_COUNT}" \
  "$@" 2>&1 | tee "${OUTPUT_DIR}/log.txt"
