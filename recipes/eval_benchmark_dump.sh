#!/usr/bin/env bash
# Eval with per-image benchmark npz dumps + offline sAP / F-score / APH
# (reference: script/evaluation/eval_stage1.sh + evaluation/eval-sAP-*.py,
#  eval-fscore-*.py, eval-aph-score-*.py run afterwards on the dumps)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: eval_benchmark_dump.sh <exp_name> <dataset_root> [gt_lines_npz_dir]'; exit 1; }
name=$1; root=$2
gtnpz=${3:-exp/$1/lines_npz/eval}
output=exp/$name
python -m gwdepth_tpu.main --eval --benchmark --dump_gt_lines \
  --output_dir "$output" --backbone resnet50 --num_queries 100 \
  --with_line --with_dense --with_center \
  --data_path "$root/images" --gt_depth_path "$root/depth" \
  --gt_seg_path "$root/seg" --gt_line_path "$root/lines" \
  --filenames_file_train "$root/train.txt" --filenames_file_eval "$root/val.txt" \
  --glassrgbd_images_json "$root/glassrgbd_images.json"
python - "$output/benchmark/benchmark_val" "$gtnpz" <<'PY'
import sys, json
from gwdepth_tpu.evaluation.line_metrics import sap_score, fscore_score, aph_score, pr_curve, plot_pr_curves
pred, gt = sys.argv[1], sys.argv[2]
print(json.dumps({"sAP": sap_score(pred, gt), "F": fscore_score(pred, gt),
                  "APH": aph_score(pred, gt)}))
plot_pr_curves({"stage1": pr_curve(pred, gt, 10)}, pred + "/pr10.png")
PY
