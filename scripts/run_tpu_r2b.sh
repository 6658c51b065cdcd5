#!/bin/bash
# Round-2 TPU batch B:
#   1. 512^3 fuse-only matrix: cap right-sizing x pixel_share scaling
#   2. 120-frame TUM-layout dataset eval (the VERDICT item-2 run) + preset A/Bs
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2b.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ ! -d /tmp/tum_synth120 ]; then
    log "=== 0. generate dataset (CPU) ==="
    timeout 900 python -m tracking_sdf_tpu.data.make_sequence \
        --out /tmp/tum_synth120 --frames 120 >> "$LOG" 2>&1
fi
log "=== 1. 512^3 fuse matrix ==="
timeout 3000 python scripts/probe_512_fuse.py >> "$LOG" 2>&1
log "=== 2. dataset eval matrix (120 frames each) ==="
timeout 4800 python scripts/probe_dataset_eval.py >> "$LOG" 2>&1
log "done"
