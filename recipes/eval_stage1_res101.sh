#!/usr/bin/env bash
# Stage-1 evaluation with the ResNet-101 backbone
# (reference: script/evaluation/eval_stage1_line-glassrgbd.sh run against
#  the a1_train_stage1_res101.sh experiment)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: eval_stage1_res101.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
python -m gwdepth_tpu.main --eval \
  --output_dir "$output" --backbone resnet101 --num_queries 100 \
  --with_line --with_dense --with_center \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json"
