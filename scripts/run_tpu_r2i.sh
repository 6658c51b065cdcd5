#!/bin/bash
# Round-2 TPU batch I (final):
#   1. headline benches at the new preset defaults (warm cache: batch H
#      compiled the identical configs via BENCH_SHARE)
#   2. Pallas GN A/B at Q=512 (2048 blew scoped VMEM)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2i.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1a. bench tum256 (share 4x4 default) ==="
BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 1b. bench tum512 (share 8x4 default) ==="
BENCH_PRESET=tum512 BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 2. Pallas GN A/B (Q=512) ==="
timeout 2400 python scripts/probe_pallas_gn.py >> "$LOG" 2>&1
log "done"
