#!/usr/bin/env bash
# Stage-1 (LFAE) training on cityscapes — equivalent of the reference's
# scripts/AE/train_AE_cityscapes.sh, bound to this framework's CLI.
# Override any VAR=value on the command line, e.g. BATCH=64 ./train_AE_cityscapes.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
CONFIG=${CONFIG:-configs/AE/cityscapes.yaml}
LOG_DIR=${LOG_DIR:-logs_training/AE/cityscapes}
SEED=${SEED:-1234}
BATCH=${BATCH:-100}
python scripts/train_ae.py --config "$CONFIG" --log_dir "$LOG_DIR" \
    --seed "$SEED" --batch_size "$BATCH" ${RESUME:+--checkpoint "$RESUME" --set_start} "$@"
