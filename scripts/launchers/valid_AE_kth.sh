#!/usr/bin/env bash
# Stage-1 (LFAE) reconstruction eval on kth (ref scripts/AE/valid_AE_kth.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
CONFIG=${CONFIG:-configs/AE/kth.yaml}
CKPT=${CKPT:-logs_training/AE/kth/RegionMM.ckpt}
LOG_DIR=${LOG_DIR:-logs_validation/AE/kth}
SEED=${SEED:-1234}
python scripts/valid_ae.py --config "$CONFIG" --checkpoint "$CKPT" \
    --log_dir "$LOG_DIR" --seed "$SEED" "$@"
