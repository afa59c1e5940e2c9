#!/bin/bash
# DTU fast preset — parity with reference scripts/dtu_fast.sh (blocksize 15,
# 6 iterations, view selection 10-30 degrees, max 9 views, fusion 0.1/30/3).
# Usage: ./dtu_fast.sh <images_folder> <p_folder> [output_folder]
set -e
IMAGES=${1:?images folder}
PFOLDER=${2:?folder of per-view .P files}
OUT=${3:-results/dtu}
python -m gipuma_tpu.cli -images_folder "$IMAGES" -p_folder "$PFOLDER" \
    --preset dtu_fast \
    --all_views --skip_existing \
    --fuse --disp_thresh 0.1 --normal_thresh 30 --num_consistent 3 \
    -output_folder "$OUT"
