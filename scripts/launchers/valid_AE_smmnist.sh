#!/usr/bin/env bash
# Stage-1 (LFAE) reconstruction eval on smmnist (ref scripts/AE/valid_AE_smmnist.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
CONFIG=${CONFIG:-configs/AE/smmnist.yaml}
CKPT=${CKPT:-logs_training/AE/smmnist/RegionMM.ckpt}
LOG_DIR=${LOG_DIR:-logs_validation/AE/smmnist}
SEED=${SEED:-1234}
python scripts/valid_ae.py --config "$CONFIG" --checkpoint "$CKPT" \
    --log_dir "$LOG_DIR" --seed "$SEED" "$@"
