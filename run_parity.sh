#!/usr/bin/env bash
# One-command accuracy-parity runbook (BASELINE.md table).
#
#   ./run_parity.sh --ckpt Net_epoch_best.pth \
#       --flow-ckpt gmflow_things-e9887eda.pth --data-root /data/VCOD
#
#   ./run_parity.sh --drill     # synthetic end-to-end pipeline proof
#
# See tools/run_parity.py for all options (--long-ckpt, --datasets, --out).
set -euo pipefail
cd "$(dirname "$0")"
exec python tools/run_parity.py "$@"
