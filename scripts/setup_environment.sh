#!/usr/bin/env bash
# Environment bootstrap (reference setup_python_environment.sh /
# setup_enki_environment.sh role): create a venv with the TPU JAX stack and
# build the native record store.
set -euo pipefail

VENV_DIR="${VENV_DIR:-.venv}"
python3 -m venv "${VENV_DIR}"
source "${VENV_DIR}/bin/activate"
pip install --upgrade pip

# TPU hosts: jax[tpu]; CPU-only development: plain jax
if [[ "${TPU:-0}" == "1" ]]; then
  pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
else
  pip install jax
fi
# opencv-python backs the imread fallback for formats imageio's plugins
# miss (tpuseg/utils/imagio.py); optional at runtime, installed by default
pip install flax optax orbax-checkpoint numpy scipy protobuf imageio \
    opencv-python tensorboardX pytest

# native record store
make -C "$(dirname "$0")/../native"

echo "tpuseg environment ready; run: python -m pytest tests/ -q"
