#!/bin/bash
# Round-2 TPU batch G:
#   1. Pallas GN A/B (tile-aligned output fix) + gather-share roofline data
#   2. interleaved cap A/B at 512^3 (the E/F sweeps disagreed with batch
#      B's linear cap scaling — ABAB ordering cancels congestion drift)
#   3. MC timing after device-side cell discovery
#   4. raycast A/B re-check + dedupe probe (both now value-fetch timed)
#   5. rays/s with fetched warmup
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r2g.log}"
: > "$LOG"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== 1. Pallas GN A/B ==="
timeout 2400 python scripts/probe_pallas_gn.py >> "$LOG" 2>&1
log "=== 2. interleaved cap A/B (4 runs: 38912, 30720, 38912, 30720) ==="
timeout 3600 python - >> "$LOG" 2>&1 <<'EOF'
import os, sys
os.environ.setdefault("BENCH_PRESET", "tum512")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import bench as B
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.fusion.brickmajor import fuse_frame_brickmajor
K = 10
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
vdt = jnp.bfloat16 if cfg.fusion.storage_dtype == "bfloat16" else None
bg0 = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
pose0 = poses[0]

def run(label, cap):
    fcfg = cfg.fusion._replace(mode="bricked")
    @jax.jit
    def fuse_k(bg, pose):
        def body(k, bg):
            bg2, _, _ = fuse_frame_brickmajor(
                bg, Pose(pose.R, pose.t + 1e-6 * k), PTS[k % B.K],
                NRM[k % B.K], rgb, params=params, cam=cam, cfg=fcfg,
                bs=(8, 8, 8), cap=cap, cap_free=12288, emit_dm="view")
            return bg2
        return jax.lax.fori_loop(0, K, body, bg)
    out = fuse_k(bg0, pose0)
    float(out.W.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fuse_k(out, pose0)
        float(out.W.ravel()[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:28s} {best*1e3:8.2f} ms", flush=True)

for rep in range(2):
    run(f"cap=38912 (rep {rep})", 38912)
    run(f"cap=30720 (rep {rep})", 30720)
EOF
log "=== 3. MC timing (device cell discovery) ==="
timeout 1800 python scripts/probe_mc_tpu.py >> "$LOG" 2>&1
log "=== 4a. raycast A/B ==="
timeout 1800 python scripts/probe_raycast_tpu.py >> "$LOG" 2>&1
log "=== 4b. dedupe probe ==="
timeout 1200 python scripts/probe_dedupe.py >> "$LOG" 2>&1
log "=== 5. rays/s ==="
timeout 1800 python scripts/bench_scaling.py --rays-only >> "$LOG" 2>&1
log "done"
