#!/usr/bin/env bash
# Create a virtualenv with the framework's dependencies (reference
# scripts/build-venv.sh equivalent). On TPU VMs prefer the preinstalled
# jax[tpu]; this installs CPU jax for development machines.
set -euo pipefail
cd "$(dirname "$0")/.."

PYTHON="${PYTHON:-python3}"
$PYTHON -m venv .venv
. .venv/bin/activate
pip install --upgrade pip
pip install -r requirements.txt
echo "Done. Activate with: source .venv/bin/activate"
