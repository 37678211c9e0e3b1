#!/usr/bin/env bash
# GT-free inference over a folder of images (no reference equivalent)
# Usage: bash recipes/predict_folder.sh <images_dir> <out_dir> <ckpt_dir_or_pth>
set -e
[[ $# -lt 3 ]] && { echo 'Usage: predict_folder.sh <images_dir> <out_dir> <ckpt_dir_or_pth>'; exit 1; }
imgs=$1; out=$2; ckpt=$3
if [[ "$ckpt" == *.pth ]]; then flag=--torch_init; else flag=--resume; fi
python -m gwdepth_tpu.predict --images "$imgs" --output_dir "$out" \
  "$flag" "$ckpt" --save_vis
