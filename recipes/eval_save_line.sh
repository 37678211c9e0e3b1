#!/usr/bin/env bash
# Evaluation with pred-vs-GT line overlays rendered per image
# (reference: engine_glassrgbd.py:286-305 --save_line path via
#  evaluation/eval_post_online.py:118-176)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: eval_save_line.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
python -m gwdepth_tpu.main --eval --save_line \
  --output_dir "$output" --backbone resnet50 --num_queries 100 \
  --with_line --with_dense --with_center \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json"
