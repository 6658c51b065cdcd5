#!/bin/bash
# Post-recovery TPU batch (serial; exclusive device claim):
#   1. bfloat16 value-leaf storage on FAT rows (merge now bandwidth-bound)
#   2. tum512 with bf16 storage (261 MB HBM overage at f32 -> should fit)
#   3. tum512 f32 retry only if bf16 fits with slack
#   4. fresh per-stage frame breakdown on the restored build
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_abs2.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1. bench (BENCH_DTYPE=bfloat16, fat rows) ==="
BENCH_DTYPE=bfloat16 BENCH_BUDGET_S=2000 timeout 2100 python bench.py >> "$LOG" 2>&1
log "=== 2. bench (BENCH_PRESET=tum512 + bf16) ==="
BENCH_PRESET=tum512 BENCH_DTYPE=bfloat16 BENCH_BUDGET_S=2000 timeout 2100 \
    python bench.py >> "$LOG" 2>&1
log "=== 3. frame breakdown (restored build) ==="
timeout 1800 python scripts/probe_frame_breakdown.py >> "$LOG" 2>&1
log "done"
