#!/usr/bin/env bash
# Joint line+depth fine-tune from a stage-1 line checkpoint
# (reference: script/train/a1_train_res50_linergbd.sh — bs 1, 200 epochs,
#  lr_drop 70, --log_depth_error)
set -e
[[ $# -lt 3 ]] && { echo 'Usage: train_linergbd.sh <exp_name> <dataset_root> <resume_ckpt_dir_or_pth> [extra flags]'; exit 1; }
name=$1; root=$2; resume=$3; shift 3
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet50 --resume "$resume" \
  --batch_size 1 --epochs 200 --lr_drop 70 --num_queries 100 \
  --with_line --with_center --with_dense --log_depth_error \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json" \
  "$@" | tee -a "$output/history.txt"
