#!/bin/bash
# Round-5 evidence run: identical protocol to run_evidence_r4.sh (dataset
# -> stage-1 LFAE -> stage-2 DM in two phases with a real mid-run resume
# -> autoregressive eval), with the one round-5 delta from the queue:
# the AE stage runs --device_augment (raw-uint8 transfer + in-graph
# flip/jitter), so EVERY stage of the evidence run is device-bound — the
# round-4 artifacts' AE phase predates the flag and ran host-augmented.
# Acceptance: same as round 4 (resume line in dm/train.log, no 0-byte
# artifacts, data_time/batch_time < 10% on every logged window) plus the
# AE phase's windows at the --device_augment step rate (~0.14 s/step on
# the shapes config vs 0.18-0.21 host-augmented).
set -e
export ROOT=${ROOT:-/tmp/shapes_r3}
export RUN=${RUN:-/tmp/runs_r5}
export ART=${ART:-artifacts/trainrun_r5}
export AE_EXTRA=${AE_EXTRA:---device_augment}
export FORCE_AE=1
exec bash "$(dirname "$0")/run_evidence_r4.sh"
