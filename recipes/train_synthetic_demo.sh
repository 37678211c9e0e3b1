#!/usr/bin/env bash
# Full-pipeline demo WITHOUT the proprietary GW-Depth dataset: fabricate
# learnable glass-wall scenes (gwdepth_tpu/tools/synthetic.py), then run
# the reference stage-1 training recipe on them at full size.
# No reference counterpart — the reference cannot run without the real
# dataset; this is the "try it in five minutes" path.
set -euo pipefail

ROOT=${1:-/tmp/gw_synth}
OUT=${2:-exp/synthetic_demo}
EPOCHS=${3:-6}

python -m gwdepth_tpu.tools.synthetic --root "$ROOT" \
    --n_train 48 --n_val 12 --seed 7

python -m gwdepth_tpu.main \
    --epochs "$EPOCHS" --batch_size 1 --num_workers 2 \
    --with_line --with_dense --with_center \
    --data_path "$ROOT/rgb" --gt_depth_path "$ROOT/depth" \
    --gt_seg_path "$ROOT/seg" --gt_line_path "$ROOT/lines" \
    --filenames_file_train "$ROOT/train.txt" \
    --filenames_file_eval "$ROOT/val.txt" \
    --glassrgbd_images_json "$ROOT/glassrgbd_images.json" \
    --output_dir "$OUT"
