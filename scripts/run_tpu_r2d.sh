#!/bin/bash
# Round-2 TPU batch D (512^3 push):
#   1. FULL-brick composition (zero-update fraction -> OCCLUDED class case?)
#      + classify-only timing + (16,8,8) brick-shape fuse A/B
#   2. factored-share A/B at 512^3 (explicit broadcast materializes ~640 MB
#      at share 4x4; the 256^3 verdict may flip)
#   3. tum512 dataset eval, share accuracy isolation (2x2 vs 4x2 vs 4x4)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2d.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1. 512^3 composition + classify + brick-shape ==="
timeout 2400 python scripts/probe_512_composition.py >> "$LOG" 2>&1
log "=== 2. factored-share A/B (fuse-only, preset variant) ==="
FUSE_VARIANTS=preset timeout 1800 python scripts/probe_512_fuse.py >> "$LOG" 2>&1
FUSE_VARIANTS=preset TSDF_FACTORED_SHARE=1 timeout 1800 \
    python scripts/probe_512_fuse.py >> "$LOG" 2>&1
log "=== 3. tum512 dataset eval (share isolation) ==="
PRESET=tum512 VARIANTS=share timeout 4800 \
    python scripts/probe_dataset_eval.py >> "$LOG" 2>&1
log "done"
