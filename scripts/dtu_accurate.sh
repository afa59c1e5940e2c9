#!/bin/bash
# DTU accurate preset — parity with reference scripts/dtu_accurate.sh
# (blocksize 25, 8 iterations, no max_views cap).
set -e
IMAGES=${1:?images folder}
PFOLDER=${2:?folder of per-view .P files}
OUT=${3:-results/dtu_accurate}
python -m gipuma_tpu.cli -images_folder "$IMAGES" -p_folder "$PFOLDER" \
    --preset dtu_accurate \
    --all_views --skip_existing \
    --fuse --disp_thresh 0.1 --normal_thresh 30 --num_consistent 3 \
    -output_folder "$OUT"
