#!/usr/bin/env bash
# Offline AP-H over existing benchmark npz dumps (numpy equivalent of the
# reference's MATLAB pipeline, reference: script/evaluation/eval_aph_*.sh
# + evaluation/eval-aph-score-*.py; numerics acknowledged non-identical)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: eval_aph.sh <pred_npz_dir> <gt_npz_dir>'; exit 1; }
pred=$1; gt=$2
python - "$pred" "$gt" <<'PY'
import sys, json
from gwdepth_tpu.evaluation.line_metrics import aph_score, pr_curve, plot_pr_curves
pred, gt = sys.argv[1], sys.argv[2]
print(json.dumps({"APH": aph_score(pred, gt)}))
plot_pr_curves({"aph": pr_curve(pred, gt, 10)}, pred + "/pr10.png")
PY
