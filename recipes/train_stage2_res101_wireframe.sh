#!/usr/bin/env bash
# Stage-2 ResNet-101 wireframe fine-tune from frozen stage-1 weights
# (reference: script/train/a3_train_stage2_res101.sh — --frozen_weights
#  <stage1 ckpt> --no_opt, bs 1, 300 epochs, lr_drop 120)
set -e
[[ $# -lt 3 ]] && { echo 'Usage: train_stage2_res101_wireframe.sh <exp_name> <coco_root> <stage1_ckpt.pth>'; exit 1; }
name=$1; root=$2; frozen=$3; shift 3
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet101 --frozen_weights "$frozen" \
  --batch_size 1 --epochs 300 --lr_drop 120 --num_queries 100 \
  --with_line --with_center \
  --coco_path "$root" \
  --coco_ann_train "$root/annotations/lines_train2017.json" \
  --coco_ann_val "$root/annotations/lines_val2017.json" \
  "$@" | tee -a "$output/history.txt"
