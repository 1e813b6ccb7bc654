#!/usr/bin/env bash
# Stage-2 (diffusion) training on bair (ref scripts/DM/train_DM_bair.sh).
# Requires a stage-1 checkpoint (AE_CKPT).
set -euo pipefail
cd "$(dirname "$0")/../.."
CONFIG=${CONFIG:-configs/DM/bair.yaml}
AE_CKPT=${AE_CKPT:-logs_training/AE/bair/RegionMM.ckpt}
LOG_DIR=${LOG_DIR:-logs_training/DM/bair}
SEED=${SEED:-1234}
BATCH=${BATCH:-32}
python scripts/train_dm.py --config "$CONFIG" --flowae_checkpoint "$AE_CKPT" \
    --log_dir "$LOG_DIR" --seed "$SEED" --batch_size "$BATCH" --bf16 \
    ${RESUME:+--checkpoint "$RESUME" --set_start} "$@"
