#!/usr/bin/env bash
# Evaluation with per-image dense prediction grids saved to disk
# (reference: engine_glassrgbd.py:266-274 --save_dense visualization path)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: eval_save_dense.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
python -m gwdepth_tpu.main --eval --save_dense \
  --output_dir "$output" --backbone resnet50 --num_queries 100 \
  --with_line --with_dense --with_center \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json"
