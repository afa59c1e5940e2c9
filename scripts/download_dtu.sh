#!/bin/bash
# Fetch the DTU MVS rectified images + calibration — parity with reference
# scripts/download-dtu.sh.  Run where egress exists (large!).
set -e
DEST=${1:-data/dtu}
mkdir -p "$DEST" && cd "$DEST"
echo "DTU is distributed via http://roboimagedata.compute.dtu.dk/?page_id=36"
echo "Download 'Rectified' images and 'Calibration' into $DEST/"
