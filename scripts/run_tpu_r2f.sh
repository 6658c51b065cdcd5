#!/bin/bash
# Round-2 TPU batch F (clean 512^3 re-measure + deferred probes):
#   1. tum512 breakdown with fused zeta/eta query (n_full max -> cap sizing)
#   2. cap trim sweep re-run (batch E's sweep was congestion-noisy:
#      30720 measured slower than 38912)
#   3. tum512 + tum256 headlines
#   4. Pallas GN A/B + roofline inputs
#   5. raycast A/B + MC breakdown (value-fetch timing)
#   6. rays/s (production masked-view path)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2f.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1. tum512 breakdown (fused query) ==="
BENCH_PRESET=tum512 timeout 2400 python scripts/probe_frame_breakdown.py >> "$LOG" 2>&1
log "=== 2. cap trim sweep ==="
FUSE_VARIANTS=occluded timeout 2400 python scripts/probe_512_fuse.py >> "$LOG" 2>&1
log "=== 3a. bench tum512 ==="
BENCH_PRESET=tum512 BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 3b. bench tum256 ==="
BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 4. Pallas GN A/B ==="
timeout 2400 python scripts/probe_pallas_gn.py >> "$LOG" 2>&1
log "=== 5a. raycast A/B ==="
timeout 1800 python scripts/probe_raycast_tpu.py >> "$LOG" 2>&1
log "=== 5b. MC breakdown ==="
timeout 1800 python scripts/probe_mc_breakdown.py >> "$LOG" 2>&1
log "=== 6. rays/s ==="
timeout 1800 python scripts/bench_scaling.py --rays-only >> "$LOG" 2>&1
log "done"
