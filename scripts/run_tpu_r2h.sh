#!/bin/bash
# Round-2 TPU batch H (the 512^3 endgame):
#   1. share 8x4 / 8x8 accuracy on the 120-frame dataset at tum512
#   2. tum512 bench at share 8x4 (expected fuse ~41 ms -> ~19-20 fps)
#   3. tum512 pyramid A/B: (4,2,1) vs (2,1) vs flat (track 9.9 ms today)
#   4. 256^3: share 4x4 bench + accuracy (metric-equivalent headroom check)
#   5. Pallas GN A/B (pad-packed output)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2h.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1. tum512 dataset eval share 4x4/8x4/8x8 ==="
PRESET=tum512 VARIANTS=share84 timeout 4800 \
    python scripts/probe_dataset_eval.py >> "$LOG" 2>&1
log "=== 2. bench tum512 share=8x4 ==="
BENCH_PRESET=tum512 BENCH_SHARE=8x4 BENCH_BUDGET_S=2000 timeout 2400 \
    python bench.py >> "$LOG" 2>&1
log "=== 3a. bench tum512 pyr=2,1 ==="
BENCH_PRESET=tum512 BENCH_SHARE=8x4 BENCH_PYR=2,1 BENCH_BUDGET_S=2000 \
    timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 3b. bench tum512 flat ==="
BENCH_PRESET=tum512 BENCH_SHARE=8x4 BENCH_PYR=flat BENCH_BUDGET_S=2000 \
    timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 4a. bench tum256 share=4x4 ==="
BENCH_SHARE=4x4 BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 4b. tum256 dataset eval share 4x4/8x4 ==="
VARIANTS=share84 timeout 4800 python scripts/probe_dataset_eval.py >> "$LOG" 2>&1
log "=== 5. Pallas GN A/B ==="
timeout 2400 python scripts/probe_pallas_gn.py >> "$LOG" 2>&1
log "done"
