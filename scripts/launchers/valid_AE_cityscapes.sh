#!/usr/bin/env bash
# Stage-1 (LFAE) reconstruction eval on cityscapes (ref scripts/AE/valid_AE_cityscapes.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
CONFIG=${CONFIG:-configs/AE/cityscapes.yaml}
CKPT=${CKPT:-logs_training/AE/cityscapes/RegionMM.ckpt}
LOG_DIR=${LOG_DIR:-logs_validation/AE/cityscapes}
SEED=${SEED:-1234}
python scripts/valid_ae.py --config "$CONFIG" --checkpoint "$CKPT" \
    --log_dir "$LOG_DIR" --seed "$SEED" "$@"
