#!/bin/bash
# Round-2 TPU batch E:
#   1. dispatch-dedupe hypothesis check (probe methodology)
#   2. raycast A/B, varied-input reps
#   3. MC breakdown after device-side compaction + corner-gradient winding
#   4. rays/s sweep retry (crashed with a backend FailedPrecondition in C)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2e.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1. dedupe check ==="
timeout 1200 python scripts/probe_dedupe.py >> "$LOG" 2>&1
log "=== 2. raycast A/B (varied reps) ==="
timeout 1800 python scripts/probe_raycast_tpu.py >> "$LOG" 2>&1
log "=== 3. MC breakdown (device compaction) ==="
timeout 1800 python scripts/probe_mc_breakdown.py >> "$LOG" 2>&1
log "=== 4. rays/s sweep ==="
timeout 1800 python scripts/bench_scaling.py --rays-only >> "$LOG" 2>&1
log "=== 5. post-OCCLUDED 512^3: n_full max + cap trim sweep ==="
BENCH_PRESET=tum512 timeout 2400 python scripts/probe_frame_breakdown.py >> "$LOG" 2>&1
FUSE_VARIANTS=occluded timeout 2400 python scripts/probe_512_fuse.py >> "$LOG" 2>&1
log "=== 6. 256^3 composition (does OCCLUDED help the headline?) ==="
BENCH_PRESET=tum256 timeout 1800 python scripts/probe_512_composition.py >> "$LOG" 2>&1
log "done"
