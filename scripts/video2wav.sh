#!/usr/bin/env bash
# Extract mono 16 kHz wav audio from every MELD mp4 clip (reference
# scripts/video2wav.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/mp4towav.py "$@"
