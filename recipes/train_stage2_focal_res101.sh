#!/usr/bin/env bash
# Focal-loss label fine-tune, ResNet-50
# (reference: script/train/a4.sh — resume
#  --no_opt, lr 1e-5, 25 epochs, lr_drop 25, focal gamma 2.0, save_freq 1)
set -e
[[ $# -lt 3 ]] && { echo 'Usage: train_stage2_focal_res101.sh <exp_name> <coco_root> <resume_ckpt_dir_or_pth> [extra flags]'; exit 1; }
name=$1; root=$2; resume=$3; shift 3
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet101 --resume "$resume" --no_opt \
  --batch_size 1 --epochs 25 --lr_drop 25 --lr 1e-5 --save_freq 1 \
  --num_queries 100 --label_loss_func focal_loss --focal_gamma 2.0 \
  --with_line --with_center \
  --coco_path "$root" \
  --coco_ann_train "$root/annotations/lines_train2017.json" \
  --coco_ann_val "$root/annotations/lines_val2017.json" \
  "$@" | tee -a "$output/history.txt"
