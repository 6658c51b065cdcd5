#!/bin/bash
# Round-2 TPU batch C:
#   1. tum512 headline at the re-tuned preset (cap 38912 + share 4x4)
#   2. merge-packing microprobe (values/weights dtype grouping)
#   3. tum256 headline (now prints breakdown + end-to-end lines)
#   4. raycast empty-skip A/B (fixed on-device-loop probe)
#   5. marching-cubes stage breakdown (transfer vs compute)
#   6. sharded-vs-local runner on the real chip + rays/s sweep (VERDICT 7)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2c.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1. bench tum512 (re-tuned preset) ==="
BENCH_PRESET=tum512 BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 2. merge-pack microprobe ==="
timeout 1800 python scripts/probe_merge_pack.py >> "$LOG" 2>&1
log "=== 3. bench tum256 ==="
BENCH_BUDGET_S=2000 timeout 2400 python bench.py >> "$LOG" 2>&1
log "=== 4. raycast A/B ==="
timeout 1800 python scripts/probe_raycast_tpu.py >> "$LOG" 2>&1
log "=== 5. MC breakdown ==="
timeout 1800 python scripts/probe_mc_breakdown.py >> "$LOG" 2>&1
log "=== 6. sharded runner (1-dev TPU mesh) + rays/s ==="
timeout 1200 python -m tracking_sdf_tpu.cli --preset tum256 --synthetic \
    --frames 10 --trajectory /tmp/t_local.txt --json >> "$LOG" 2>&1
timeout 1200 python -m tracking_sdf_tpu.cli --preset tum256 --synthetic \
    --frames 10 --distributed --trajectory /tmp/t_dist.txt --json >> "$LOG" 2>&1
timeout 1800 python scripts/bench_scaling.py --rays-only >> "$LOG" 2>&1
log "done"
