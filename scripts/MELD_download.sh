#!/usr/bin/env bash
# Fetch and unpack the MELD corpus into data/MELD.Raw (reference
# scripts/MELD_download.sh equivalent). Requires network access.
set -euo pipefail

URL="https://huggingface.co/datasets/declare-lab/MELD/resolve/main/MELD.Raw.tar.gz"
mkdir -p data
cd data

if [ ! -f MELD.Raw.tar.gz ]; then
    echo "Downloading MELD.Raw.tar.gz ..."
    (command -v wget >/dev/null && wget -c "$URL") || curl -L -C - -o MELD.Raw.tar.gz "$URL"
fi

echo "Extracting ..."
tar -xzf MELD.Raw.tar.gz
cd MELD.Raw
for split in train.tar.gz dev.tar.gz test.tar.gz; do
    [ -f "$split" ] && tar -xzf "$split"
done
echo "Done. Now run scripts/video2wav.sh to extract audio."
