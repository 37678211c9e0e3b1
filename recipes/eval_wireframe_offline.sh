#!/usr/bin/env bash
# Offline sAP / F-score over existing benchmark npz dumps
# (reference: script/evaluation/eval_stage1.sh + eval_stage2.sh loops over
#  evaluation/eval-sAP-*.py and eval-fscore-*.py)
set -e
[[ $# -lt 2 ]] && { echo 'Usage: eval_wireframe_offline.sh <pred_npz_dir> <gt_npz_dir>'; exit 1; }
pred=$1; gt=$2
python - "$pred" "$gt" <<'PY'
import sys, json
from gwdepth_tpu.evaluation.line_metrics import sap_score, fscore_score
pred, gt = sys.argv[1], sys.argv[2]
print(json.dumps({"sAP": sap_score(pred, gt), "F": fscore_score(pred, gt)}))
PY
