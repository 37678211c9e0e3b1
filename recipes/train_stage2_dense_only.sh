#!/usr/bin/env bash
# Stage-2 dense-only fine-tune resuming stage-1 weights without optimizer
# (reference: script/train/a2_train_stage2_res50_glassrgbd.sh —
#  --resume <ckpt> --no_opt, bs 1, 150 epochs, lr_drop 50, --with_dense)
set -e
[[ $# -lt 3 ]] && { echo 'Usage: train_stage2_dense_only.sh <exp_name> <dataset_root> <resume_ckpt_dir_or_pth> [extra flags]'; exit 1; }
name=$1; root=$2; resume=$3; shift 3
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet50 --resume "$resume" --no_opt \
  --batch_size 1 --epochs 150 --lr_drop 50 --num_queries 100 \
  --with_dense \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json" \
  "$@" | tee -a "$output/history.txt"
