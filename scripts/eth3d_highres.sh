#!/usr/bin/env bash
# Tanks&Temples / ETH3D high-res multi-host run (BASELINE.json config 5):
# 4K+ images, N hosts, distributed PatchMatch + fused point cloud.
#
# Each host runs the SAME command with its jax.distributed identity in the
# env (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID — or
# nothing on a TPU pod, where jax auto-detects).  Hosts partition the
# reference views deterministically and write to the shared results dir;
# re-running completes whatever is missing (idempotent resume).
#
# Usage: eth3d_highres.sh <image_folder> <p_folder> <results_dir>
set -eu
IMAGES=${1:?image folder}
PFOLDER=${2:?P-matrix folder}
RESULTS=${3:-results/highres}

python -m gipuma_tpu.cli \
    -images_folder "$IMAGES" -p_folder "$PFOLDER" \
    -output_folder "$RESULTS" \
    --preset highres --all_views --distributed

# Fusion runs once, on the host that sees all depth maps (rank 0 by
# convention); consistency thresholds follow the dtu_fast fusibile call
# (scripts/dtu_fast.sh:56-57 in the reference).
if [ "${JAX_PROCESS_ID:-0}" = "0" ]; then
    python -m gipuma_tpu.cli \
        -images_folder "$IMAGES" -p_folder "$PFOLDER" \
        -output_folder "$RESULTS" \
        --preset highres --all_views --distributed \
        --fuse --disp_thresh 0.25 --normal_thresh 30 --num_consistent 3
fi
