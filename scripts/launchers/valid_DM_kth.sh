#!/usr/bin/env bash
# Stage-2 eval on kth: multi-trajectory sampling, best-of-n selection,
# FVD/PSNR/SSIM/LPIPS + CI95 (ref scripts/DM/valid_DM_kth.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
CONFIG=${CONFIG:-configs/DM/kth.yaml}
CKPT=${CKPT:-logs_training/DM/kth/flowdiff.ckpt}
AE_CKPT=${AE_CKPT:-logs_training/AE/kth/RegionMM.ckpt}
LOG_DIR=${LOG_DIR:-logs_validation/DM/kth}
SEED=${SEED:-1234}
NUM_SAMPLE=${NUM_SAMPLE:-100}   # trajectories per video (ref NUM_SAMPLE=100)
python scripts/valid_dm.py --config "$CONFIG" --checkpoint "$CKPT" \
    --flowae_checkpoint "$AE_CKPT" --log_dir "$LOG_DIR" --seed "$SEED" \
    --num_sample_video "$NUM_SAMPLE" "$@"
