#!/usr/bin/env bash
# Offline evaluation driver (equivalent of the reference's
# eval/eval_vcod/run_eval.sh): score dumped predictions for MoCA_test + CAD.
set -euo pipefail

GT_ROOT=${GT_ROOT:-/data/VCOD}
PRED_ROOT=${PRED_ROOT:-./predictions}
OUT=${OUT:-./eval_results}

python eval_offline.py \
  --gt_root "$GT_ROOT" \
  --pred_root "$PRED_ROOT" \
  --data MoCA_test CAD_eval \
  --out "$OUT"
