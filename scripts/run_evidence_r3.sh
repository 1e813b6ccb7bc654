#!/bin/bash
# Round-3 evidence run: dataset -> stage-1 LFAE -> stage-2 DM trained in
# two phases with a REAL mid-run resume (--checkpoint --set_start) ->
# autoregressive evaluation. Mirrors artifacts/trainrun_r2 but runs the
# DM 5x longer (toward a metric plateau) and demonstrates on-chip resume
# (ref: scripts/DM/train.py:107-134 resume, :425-435 acceptance loop).
set -ex
ROOT=${ROOT:-/tmp/shapes_r3}
RUN=${RUN:-/tmp/runs_r3}
mkdir -p "$RUN"

# 1. dataset (synthetic bouncing shapes, reference HDF5 shard layout)
if [ ! -d "$ROOT" ]; then
  timeout 900 python scripts/make_dataset.py shapes --out "$ROOT" \
      --num_train 256 --num_valid 48 --num_frames 40 --image_size 64
fi

# 2. stage-1 LFAE
if [ ! -f "$RUN/ae/RegionMM.ckpt" ] || [ "${FORCE_AE:-0}" = 1 ]; then
  timeout 3000 python scripts/train_ae.py --config configs/AE/shapes.yaml \
      --root_dir "$ROOT" --log_dir "$RUN/ae" --max_steps 3500 \
      --batch_size 64 --valid_every 500 --valid_videos 16 --nan_guard 100
fi

# 3. stage-2 DM phase 1 (fresh)
timeout 3600 python scripts/train_dm.py --config configs/DM/shapes.yaml \
    --root_dir "$ROOT" --log_dir "$RUN/dm" \
    --flowae_checkpoint "$RUN/ae/RegionMM.ckpt" \
    --max_steps 8000 --batch_size 16 --valid_every 2000 --valid_videos 16 \
    --nan_guard 100 --bf16

# 4. stage-2 DM phase 2: RESUME from the rolling checkpoint mid-run
timeout 2700 python scripts/train_dm.py --config configs/DM/shapes.yaml \
    --root_dir "$ROOT" --log_dir "$RUN/dm" \
    --flowae_checkpoint "$RUN/ae/RegionMM.ckpt" \
    --checkpoint "$RUN/dm/flowdiff.ckpt" --set_start \
    --max_steps "${PHASE2_STEPS:-16000}" --batch_size 16 --valid_every 2000 \
    --valid_videos 16 --nan_guard 100 --bf16

# 5. autoregressive evaluation (best-of-n protocol)
timeout 1500 python scripts/valid_dm.py --config configs/DM/shapes.yaml \
    --root_dir "$ROOT" --log_dir "$RUN/valid" \
    --checkpoint "$RUN/dm/flowdiff.ckpt" \
    --flowae_checkpoint "$RUN/ae/RegionMM.ckpt" \
    --num_sample_video 4 --total_videos 16 --batch_size 4

echo EVIDENCE_RUN_DONE
