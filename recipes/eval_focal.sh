#!/usr/bin/env bash
# Evaluation of a focal-label-loss experiment
# (reference: script/evaluation/eval_stage2_focal.sh)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: eval_focal.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
python -m gwdepth_tpu.main --eval --benchmark \
  --output_dir "$output" --backbone resnet50 --num_queries 100 \
  --label_loss_func focal_loss --focal_gamma 2.0 \
  --with_line --with_center --with_dense \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json"
