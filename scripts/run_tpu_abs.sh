#!/bin/bash
# Pending TPU A/Bs (run serially — the device claim is exclusive):
#   1. headline bench on the committed row128+factored-share changes
#   2. bfloat16 storage A/B (BENCH_DTYPE=bfloat16)
#   3. fresh per-stage frame breakdown
# Usage: bash scripts/run_tpu_abs.sh [logfile]
# Waits for the tunnel first (trivial matmul probe), then runs each step
# with a generous budget (cold compiles through the congested remote
# helper can take many minutes; the persistent cache makes reruns cheap).
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_abs.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

# Poll until the tunnel answers or the deadline passes (default 11h —
# longer than any round; TPU_ABS_DEADLINE_S to override).
DEADLINE=$(( $(date +%s) + ${TPU_ABS_DEADLINE_S:-39600} ))
log "waiting for TPU tunnel (deadline $(date -d @$DEADLINE +%H:%M:%S))..."
i=0
while :; do
  i=$((i+1))
  if timeout 100 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256)); (x@x).block_until_ready(); print('TPU OK')" \
      2>/dev/null | grep -q "TPU OK"; then
    log "tunnel up (attempt $i)"; break
  fi
  [ "$(date +%s)" -ge "$DEADLINE" ] && { log "tunnel never recovered"; exit 1; }
  sleep 60
done

log "=== 1. bench (default: brickmajor f32) ==="
BENCH_BUDGET_S=2000 timeout 2100 python bench.py >> "$LOG" 2>&1
log "=== 2. bench (BENCH_DTYPE=bfloat16) ==="
BENCH_DTYPE=bfloat16 BENCH_BUDGET_S=2000 timeout 2100 python bench.py >> "$LOG" 2>&1
log "=== 3. bench (BENCH_STRIDE=4) ==="
BENCH_STRIDE=4 BENCH_BUDGET_S=2000 timeout 2100 python bench.py >> "$LOG" 2>&1
log "=== 4. bench (BENCH_STRIDE=4 + bf16) ==="
BENCH_STRIDE=4 BENCH_DTYPE=bfloat16 BENCH_BUDGET_S=2000 timeout 2100 \
    python bench.py >> "$LOG" 2>&1
log "=== 5. frame breakdown ==="
timeout 1800 python scripts/probe_frame_breakdown.py >> "$LOG" 2>&1
log "=== 6. bench (BENCH_PRESET=tum512) ==="
BENCH_PRESET=tum512 BENCH_BUDGET_S=2000 timeout 2100 python bench.py \
    >> "$LOG" 2>&1
log "=== 7. tracking pyramid breakdown ==="
timeout 1800 python scripts/probe_track_pyr.py >> "$LOG" 2>&1
log "done"
