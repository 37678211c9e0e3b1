#!/usr/bin/env bash
# Stage-1 training with the focal label loss
# (reference gate: src/args.py:69-71; used by script/train/a4/a5_*focal*.sh —
#  those wrap the legacy stage-2 LETR refinement, which is unbuilt in the
#  reference itself; the focal loss applies to the stage-1 criterion here)
# Usage: bash recipes/train_stage1_focal.sh <exp_name> <dataset_root>
set -e
[[ $# -lt 2 ]] && { echo 'Usage: train_stage1_focal.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
mkdir -p "$output"
python -m gwdepth_tpu.main \
  --output_dir "$output" --backbone resnet50 \
  --batch_size 1 --epochs 150 --lr_drop 50 --num_queries 100 \
  --with_line --with_dense --with_center \
  --label_loss_func focal_loss --focal_gamma 2.0 \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json" \
  | tee -a "$output/history.txt"
