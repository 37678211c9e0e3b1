#!/usr/bin/env bash
# Stage-1 ResNet-101 (reference: script/train/a1_train_stage1_res101.sh)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: train_stage1_res101.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet101 \
  --batch_size 1 --epochs 150 --lr_drop 50 --num_queries 100 \
  --with_line --with_dense --with_center \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json" \
  | tee -a "$output/history.txt"
