#!/usr/bin/env bash
# Stage-1 line-only training on GW-Depth (no dense branch)
# (reference: script/train/a0_train_stage1_res50_line.sh)
# Usage: bash recipes/train_stage1_line_only.sh <exp_name> <dataset_root>
set -e
[[ $# -lt 2 ]] && { echo 'Usage: train_stage1_line_only.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet50 \
  --batch_size 1 --epochs 150 --lr_drop 50 --num_queries 100 \
  --with_line --with_center \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json" \
  | tee -a "$output/history.txt"
