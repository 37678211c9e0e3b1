#!/usr/bin/env bash
# Stage-1 line-only pretrain from the DETR-R50 release checkpoint
# (reference: script/train/a0_train_stage1_res50.sh and
#  a0_train_stage1_res50_line.sh — identical flag sets: line branch only,
#  DETR URL warm start, bs 2, 500 epochs, lr_drop 200)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: train_stage1_res50_line_pretrain.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet50 \
  --torch_init https://dl.fbaipublicfiles.com/detr/detr-r50-e632da11.pth \
  --batch_size 2 --epochs 500 --lr_drop 200 --num_queries 100 \
  --with_line --with_center \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json" \
  | tee -a "$output/history.txt"
