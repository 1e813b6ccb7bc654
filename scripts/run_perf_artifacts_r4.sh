#!/bin/bash
# Round-4 perf-artifact battery: turns the on-chip A/B and floor
# measurements quoted in IMPLEMENTATION_NOTES.md (round 4) into
# committed, machine-readable artifacts under artifacts/perf_r4/ —
# the round-3 VERDICT asked for exactly this ("commit the standalone
# Mosaic batched-matmul ubench that currently exists only as a notes
# claim", weak #1).
#
# Stages (each independently skippable; all write JSON/JSONL):
#   1. ubench_mxu.json        — Mosaic batched-matmul floor at the exact
#                               flagship attention shapes (pallas floor,
#                               XLA floor, compute SOL).
#   2. ablate_temporal.jsonl  — fused temporal-kernel ablation table
#                               (seq-pack / head-pack / softmax / rope
#                               attribution).
#   3. bench_default.json     — the headline bench (sampling + train),
#                               current defaults (T-major adaptor ON).
#   4. bench_tmajor_off.json  — same bench with EXTDM_ADAPTOR_TMAJOR=0:
#                               the T-major adaptor-fuse A/B arm.
#   5. ae_device_augment/     — short stage-1 runs, host-augment vs
#                               --device_augment, same seed/steps; the
#                               metrics.jsonl per-window batch/data
#                               times are the A/B.
# Run on the real TPU chip. Expect long first compiles (persistent
# compilation cache warms subsequent runs).
set -ex
ART=${ART:-artifacts/perf_r4}
ROOT=${ROOT:-/tmp/shapes_ab}
RUN=${RUN:-/tmp/runs_perf_r4}
mkdir -p "$ART" "$RUN"

# Write each stage's stdout to a temp file and mv into $ART only on
# success, so a timeout/crash never leaves a truncated committed artifact.
capture() {  # capture <dest> <cmd...>
  local dest="$1"; shift
  local tmp
  tmp=$(mktemp "$RUN/stage.XXXXXX")
  "$@" > "$tmp"
  mv "$tmp" "$dest"
}

if [ "${SKIP_UBENCH:-0}" != 1 ]; then
  capture "$ART/ubench_mxu.json" timeout 900 python scripts/ubench_mxu.py
fi

if [ "${SKIP_ABLATE:-0}" != 1 ]; then
  # JSONL: one {"variant": ..., "ms": ...} object per line.
  capture "$ART/ablate_temporal.jsonl" \
      timeout 3600 python scripts/ablate_temporal.py
fi

if [ "${SKIP_BENCH:-0}" != 1 ]; then
  capture "$ART/bench_default.json" timeout 1800 python bench.py
fi

if [ "${SKIP_TMAJOR:-0}" != 1 ]; then
  capture "$ART/bench_tmajor_off.json" \
      env EXTDM_ADAPTOR_TMAJOR=0 timeout 1800 python bench.py
fi

if [ "${SKIP_AE_AB:-0}" != 1 ]; then
  # tiny dataset is enough — the A/B measures step/data time, not quality
  if [ ! -d "$ROOT" ]; then
    timeout 900 python scripts/make_dataset.py shapes --out "$ROOT" \
        --num_train 64 --num_valid 8 --num_frames 40 --image_size 64
  fi
  STEPS=${AE_AB_STEPS:-500}
  # shapes.yaml logs every 500 steps — too coarse for a short A/B; use a
  # copy with 100-step jsonl windows so each arm commits ~5 windows.
  # Fail fast if the pattern drifts (a silent sed no-op would leave each
  # arm with a single metrics window).
  grep -q 'print_freq: 500' configs/AE/shapes.yaml
  sed 's/print_freq: 500/print_freq: 100/' configs/AE/shapes.yaml \
      > "$RUN/shapes_ab.yaml"
  for arm in host device; do
    extra=""
    [ "$arm" = device ] && extra="--device_augment"
    rm -rf "$RUN/ae_$arm"
    timeout 1200 python scripts/train_ae.py --config "$RUN/shapes_ab.yaml" \
        --root_dir "$ROOT" --log_dir "$RUN/ae_$arm" --max_steps "$STEPS" \
        --batch_size 64 --valid_every 100000 $extra
    mkdir -p "$ART/ae_device_augment/$arm"
    cp "$RUN/ae_$arm/metrics.jsonl" "$ART/ae_device_augment/$arm/"
  done
fi

echo PERF_ARTIFACTS_DONE
