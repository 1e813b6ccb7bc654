#!/bin/bash
# Round-4 evidence run: dataset -> stage-1 LFAE -> stage-2 DM trained in
# two phases with a REAL mid-run resume (--checkpoint --set_start) ->
# autoregressive evaluation. Differences vs run_evidence_r3.sh, per the
# round-3 VERDICT queue:
#   #2 input pipeline: EXTDM_CLIP_CACHE_MB with the new single-flight
#      prefill (both stages) + raw-uint8 device transfer + prefetch 3 —
#      acceptance: data_time/batch_time < 10% on every logged window.
#   #3 evidence trail: Logger is now line-buffered, so the resume line
#      and the AE log survive `timeout` SIGTERMs; this script also
#      archives everything into artifacts/trainrun_r4 at the end.
#   #5 AE host cost: same 3000s budget that killed round 3's AE phase at
#      3000/3500 steps — acceptance: 3500/3500 inside the budget.
# (ref semantics: scripts/DM/train.py:107-134 resume, :425-435 valid loop)
set -ex
ROOT=${ROOT:-/tmp/shapes_r3}
RUN=${RUN:-/tmp/runs_r4}
ART=${ART:-artifacts/trainrun_r4}
export EXTDM_CLIP_CACHE_MB=${EXTDM_CLIP_CACHE_MB:-512}
mkdir -p "$RUN"

# 1. dataset (synthetic bouncing shapes, reference HDF5 shard layout)
if [ ! -d "$ROOT" ]; then
  timeout 900 python scripts/make_dataset.py shapes --out "$ROOT" \
      --num_train 256 --num_valid 48 --num_frames 40 --image_size 64
fi

# 2. stage-1 LFAE — same step count and timeout as round 3 (which timed
# out at 3000/3500); must now finish. AE_EXTRA=--device_augment runs the
# in-graph augmentation path (measured 2.2x the step rate; the committed
# round-4 artifacts were produced WITHOUT it, host-augmented).
if [ ! -f "$RUN/ae/RegionMM.ckpt" ] || [ "${FORCE_AE:-0}" = 1 ]; then
  timeout 3000 python scripts/train_ae.py --config configs/AE/shapes.yaml \
      --root_dir "$ROOT" --log_dir "$RUN/ae" --max_steps 3500 \
      --batch_size 64 --valid_every 500 --valid_videos 16 --nan_guard 100 \
      ${AE_EXTRA:-}
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

# 6. archive the evidence — logs, metrics, curves; no 0-byte files, and
# the resume line must be IN the committed dm/train.log.
mkdir -p "$ART/ae" "$ART/dm" "$ART/valid"
cp "$RUN/ae/train.log" "$RUN/ae/metrics.jsonl" "$ART/ae/"
cp "$RUN/dm/train.log" "$RUN/dm/metrics.jsonl" "$ART/dm/"
cp "$RUN/valid/metrics.txt" "$ART/valid/"
cp "$RUN/valid/sample0.gif" "$ART/valid/" 2>/dev/null || true
grep "resumed from" "$ART/dm/train.log"
for f in "$ART/ae/train.log" "$ART/dm/train.log"; do
  [ -s "$f" ] || { echo "EMPTY ARTIFACT: $f"; exit 1; }
done

echo EVIDENCE_RUN_DONE
