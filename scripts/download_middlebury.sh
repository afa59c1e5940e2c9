#!/bin/bash
# Fetch the Middlebury MVS datasets (dino/temple families) — parity with
# reference scripts/download-middlebury.sh.  Run where egress exists.
set -e
DEST=${1:-data/middlebury}
mkdir -p "$DEST" && cd "$DEST"
for ds in dino dinoRing dinoSparseRing temple templeRing templeSparseRing; do
  [ -d "$ds" ] && continue
  curl -LO "https://vision.middlebury.edu/mview/data/data/${ds}.zip"
  unzip -q "${ds}.zip" && rm "${ds}.zip"
done
