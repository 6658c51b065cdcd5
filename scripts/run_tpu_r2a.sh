#!/bin/bash
# Round-2 TPU batch A (serial; exclusive device claim):
#   1. headline at the new bf16 preset default (+ new breakdown line)
#   2. tum512 current state (the 8.88 fps VERDICT target)
#   3. tum512 frame breakdown + actual brick counts (cap sizing)
#   4. TPU closed-loop accuracy matrix (VERDICT item 4)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2a.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1. bench tum256 (bf16 preset default) ==="
BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 2. bench tum512 ==="
BENCH_PRESET=tum512 BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 3. tum512 frame breakdown ==="
BENCH_PRESET=tum512 timeout 2400 python scripts/probe_frame_breakdown.py >> "$LOG" 2>&1
log "=== 4. accuracy matrix (30-frame closed loop) ==="
timeout 3600 python scripts/probe_accuracy_matrix.py >> "$LOG" 2>&1
log "done"
