#!/usr/bin/env bash
# Multi-host (pod-slice) variant of batch_train.sh — the L6 launcher for the
# tpuseg multi-host extension (no reference counterpart: the reference's
# MirroredStrategy is single-worker by construction, sbatch_train.sh:7).
#
# Run the SAME command once per host; jax.distributed.initialize() inside
# `tpuseg-train --multihost 1` auto-detects the coordinator and process ids
# from TPU-VM metadata or Slurm env vars, so no addresses are wired here.
#
#   TPU VM pod slice:
#     gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#       --command="TRAIN_DATABASE=... TEST_DATABASE=... ./scripts/batch_train_multihost.sh"
#   Slurm (one task per host):
#     sbatch --nodes=4 --ntasks-per-node=1 --cpus-per-task=96 \
#       --wrap="srun scripts/batch_train_multihost.sh"
#
# --batch_size stays PER CHIP (reference train.py:61 semantics): the trainer
# scales the global batch by the global device count, and each host's readers
# produce only their process-local slice (parallel/distributed.py:66-87).
set -euo pipefail

TRAIN_DATABASE="${TRAIN_DATABASE:?set TRAIN_DATABASE}"
TEST_DATABASE="${TEST_DATABASE:?set TEST_DATABASE}"
OUTPUT_DIR="${OUTPUT_DIR:-./results-multihost}"
BATCH_SIZE="${BATCH_SIZE:-8}"           # per chip
READER_COUNT="${READER_COUNT:-2}"       # per chip on this host

# Host index, for log naming and the host-0-only snapshot (process ids come
# from jax.distributed): Slurm tasks export SLURM_PROCID; TPU VM runtimes
# export TPU_WORKER_ID, but a bare `gcloud ... ssh --worker=all` shell does
# NOT — fall back to the instance metadata, then to the hostname (unique per
# host, so concurrent writers still never collide on log files).
HOST_ID="${SLURM_PROCID:-${TPU_WORKER_ID:-}}"
if [[ -z "${HOST_ID}" ]]; then
  HOST_ID="$(curl -s -m 2 -H 'Metadata-Flavor: Google' \
    'http://metadata.google.internal/computeMetadata/v1/instance/attributes/agent-worker-number' \
    2>/dev/null || true)"
fi
if ! [[ "${HOST_ID}" =~ ^[0-9]+$ ]]; then
  HOST_ID="$(hostname -s)"
fi

mkdir -p "${OUTPUT_DIR}"

trap 'echo "TERM received, exiting"; exit 143' TERM

# Stage databases to node-local scratch when available (reference
# sbatch_train.sh:59-66); every host stages its own copy — readers are
# per-host and the staged path must be host-local.
if [[ -n "${SLURM_JOB_ID:-}" && -d /scratch ]]; then
  SCRATCH="/scratch/${SLURM_JOB_ID}"
  mkdir -p "${SCRATCH}/train" "${SCRATCH}/test"
  cp -r "${TRAIN_DATABASE}" "${SCRATCH}/train/"
  cp -r "${TEST_DATABASE}" "${SCRATCH}/test/"
  TRAIN_DATABASE="${SCRATCH}/train/$(basename "${TRAIN_DATABASE}")"
  TEST_DATABASE="${SCRATCH}/test/$(basename "${TEST_DATABASE}")"
fi

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
# Source snapshot from host 0 only — OUTPUT_DIR is typically a shared
# filesystem and N hosts racing the same tarball corrupts it.
if [[ "${HOST_ID}" == "0" ]]; then
  git -C "${REPO_DIR}" rev-parse HEAD > "${OUTPUT_DIR}/git_commit.txt" 2>/dev/null || true
  # write-then-rename: atomic even if host identification ever double-fires
  tar -C "${REPO_DIR}" -czf "${OUTPUT_DIR}/.snapshot.$$.tar.gz" tpuseg scripts 2>/dev/null \
    && mv -f "${OUTPUT_DIR}/.snapshot.$$.tar.gz" "${OUTPUT_DIR}/source_snapshot.tar.gz" || true
fi

# Per-host logs: the trainer already scopes checkpoint/TensorBoard/csv writes
# to process 0, but stdout (loss prints, starvation banners) is per-host.
export PYTHONPATH="${REPO_DIR}${PYTHONPATH:+:${PYTHONPATH}}"
python -m tpuseg.cli.train \
  --train_database "${TRAIN_DATABASE}" \
  --test_database "${TEST_DATABASE}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size "${BATCH_SIZE}" \
  --reader_count "${READER_COUNT}" \
  --multihost 1 \
  "$@" 2>&1 | tee "${OUTPUT_DIR}/log_host${HOST_ID}.txt"
