#!/usr/bin/env bash
# Stage-2 dense-only evaluation (no line branch)
# (reference: script/evaluation/eval_stage2_glassrgbd.sh — --eval
#  --with_dense over the a2 stage-2 experiment)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: eval_stage2_dense_only.sh <exp_name> <dataset_root>'; exit 1; }
name=$1; root=$2
output=exp/$name
python -m gwdepth_tpu.main --eval \
  --output_dir "$output" --backbone resnet50 --num_queries 100 \
  --with_dense \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json"
