#!/bin/bash
# Middlebury temple preset — parity with reference scripts/temple.sh parameters
# (blocksize 11, iterations 8, n_best 3, depth [0.3,0.8]; fusion
# disp_thresh 0.1, normal_thresh 30, num_consistent 3).
# Usage: ./temple.sh <images_folder> <krt_par_file> [output_folder]
set -e
IMAGES=${1:?images folder}
KRT=${2:?Middlebury *_par.txt file}
OUT=${3:-results/temple}
python -m gipuma_tpu.cli -images_folder "$IMAGES" -krt_file "$KRT" \
    --preset middlebury -blocksize 11 --iterations 8 --n_best 3 \
    --depth_min 0.3 --depth_max 0.8 \
    --all_views --skip_existing \
    --fuse --disp_thresh 0.1 --normal_thresh 30 --num_consistent 3 \
    -output_folder "$OUT"
