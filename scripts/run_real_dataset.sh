#!/bin/bash
# One-command real-dataset run: autodetect the calibration layout, compute a
# depth map for every view, fuse, and (if ground truth is present) evaluate.
#
# Usage: ./run_real_dataset.sh <dataset_folder> [output_folder] [preset] \
#            [extra gipuma_tpu.cli flags...]
#
# Supported layouts (see DATA_REQUEST.md for where to drop the tarballs):
#   Middlebury KRt  — <folder>/*_par.txt + images (*.png|*.ppm|*.jpg|*.pgm)
#                     (dinoSparseRing, templeRing, ... — the *_par.txt file
#                     shipped with each Middlebury MVS archive)
#   Strecha/DTU .P  — <folder>/calib/*.P (or <folder>/*.P) + images; the
#                     reference ships 192 DTU .P files in data/dtu/calib
# Images may live in <folder> itself or <folder>/images.
# GT (optional, enables error metrics): <folder>/gt/disp0.pfm or *.dmb —
# passed per run via -gt when a file matching the reference view exists.
set -e
F=${1:?dataset folder}
OUT=${2:-results/$(basename "$F")}
PRESET=${3:-}

IMDIR="$F"
[ -d "$F/images" ] && ls "$F"/images/* >/dev/null 2>&1 && IMDIR="$F/images"

KRT=""
PFOLDER=""
if compgen -G "$F"/*_par.txt > /dev/null; then
    KRT=$(compgen -G "$F"/*_par.txt | head -1)
    PRESET=${PRESET:-middlebury}
elif compgen -G "$IMDIR"/*_par.txt > /dev/null; then
    KRT=$(compgen -G "$IMDIR"/*_par.txt | head -1)
    PRESET=${PRESET:-middlebury}
elif [ -d "$F/calib" ] && compgen -G "$F"/calib/*.P > /dev/null; then
    PFOLDER="$F/calib"
    PRESET=${PRESET:-dtu_fast}
elif compgen -G "$F"/*.P > /dev/null; then
    PFOLDER="$F"
    PRESET=${PRESET:-dtu_fast}
else
    echo "error: no *_par.txt (Middlebury KRt) or *.P (Strecha/DTU) calibration found under $F" >&2
    exit 2
fi

CAL_ARGS=()
[ -n "$KRT" ] && CAL_ARGS+=(-krt_file "$KRT")
[ -n "$PFOLDER" ] && CAL_ARGS+=(-p_folder "$PFOLDER")

echo "[run_real_dataset] layout: ${KRT:+Middlebury KRt ($KRT)}${PFOLDER:+Strecha/DTU P ($PFOLDER)}"
echo "[run_real_dataset] images: $IMDIR  preset: $PRESET  output: $OUT"

python -m gipuma_tpu.cli \
    -images_folder "$IMDIR" "${CAL_ARGS[@]}" \
    --preset "$PRESET" \
    --all_views --skip_existing \
    --fuse \
    -output_folder "$OUT" \
    "${@:4}"

echo "[run_real_dataset] done: per-view dmb/ply under $OUT, fused cloud fused.ply"
