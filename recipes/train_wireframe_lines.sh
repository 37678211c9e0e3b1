#!/usr/bin/env bash
# Line-only training on a COCO-lines dataset (wireframe/YorkUrban,
# reference legacy path: script/train/a0_train_stage1_res50_line.sh + src/main.py)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: train_wireframe_lines.sh <exp_name> <coco_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet50 \
  --batch_size 1 --epochs 500 --lr_drop 200 --num_queries 1000 \
  --with_line --with_center \
  --coco_path "$root/images" \
  --coco_ann_train "$root/annotations/lines_train2017.json" \
  --coco_ann_val "$root/annotations/lines_val2017.json" \
  | tee -a "$output/history.txt"
