#!/usr/bin/env bash
# Cluster batch job for training (reference UNet/sbatch_train.sh role,
# retargeted from Slurm+GPU to a TPU VM: one host drives all local chips via
# the SPMD mesh, so no per-GPU env vars are needed).
#
# Usage under Slurm:   sbatch --ntasks=1 --cpus-per-task=96 batch_train.sh
# Usage standalone:    ./batch_train.sh
#
# The script never cd's: relative TRAIN/TEST_DATABASE and OUTPUT_DIR resolve
# against the caller's cwd for their whole lifetime (a mid-script cd used to
# split outputs across two directories and lose log.txt).
set -euo pipefail

TRAIN_DATABASE="${TRAIN_DATABASE:?set TRAIN_DATABASE}"
TEST_DATABASE="${TEST_DATABASE:?set TEST_DATABASE}"
OUTPUT_DIR="${OUTPUT_DIR:-./results-$(date +%Y%m%dT%H%M%S)}"
BATCH_SIZE="${BATCH_SIZE:-8}"           # per chip
READER_COUNT="${READER_COUNT:-2}"       # per chip

mkdir -p "${OUTPUT_DIR}"

# Exit on scheduler TERM (reference sbatch_train.sh:40-47) — but with a
# nonzero status: reporting a preempted half-finished run as COMPLETED lets
# afterok-dependent jobs consume a checkpoint from an unfinished run.
trap 'echo "TERM received, exiting"; exit 143' TERM

# stage databases to node-local scratch when available (sbatch_train.sh:59-66);
# distinct train/ and test/ subdirs: same-basename databases used to merge
# into one staged copy, silently testing on the training data
if [[ -n "${SLURM_JOB_ID:-}" && -d /scratch ]]; then
  SCRATCH="/scratch/${SLURM_JOB_ID}"
  mkdir -p "${SCRATCH}/train" "${SCRATCH}/test"
  cp -r "${TRAIN_DATABASE}" "${SCRATCH}/train/"
  cp -r "${TEST_DATABASE}" "${SCRATCH}/test/"
  TRAIN_DATABASE="${SCRATCH}/train/$(basename "${TRAIN_DATABASE}")"
  TEST_DATABASE="${SCRATCH}/test/$(basename "${TEST_DATABASE}")"
fi

# snapshot the source into the results dir for reproducibility (sbatch_train.sh:72-73)
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
git -C "${REPO_DIR}" rev-parse HEAD > "${OUTPUT_DIR}/git_commit.txt" 2>/dev/null || true
tar -C "${REPO_DIR}" -czf "${OUTPUT_DIR}/source_snapshot.tar.gz" tpuseg scripts 2>/dev/null || true

export PYTHONPATH="${REPO_DIR}${PYTHONPATH:+:${PYTHONPATH}}"
python -m tpuseg.cli.train \
  --train_database "${TRAIN_DATABASE}" \
  --test_database "${TEST_DATABASE}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size "${BATCH_SIZE}" \
  --reader_count "${READER_COUNT}" \
  "$@" 2>&1 | tee "${OUTPUT_DIR}/log.txt"
