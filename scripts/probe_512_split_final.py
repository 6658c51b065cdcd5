"""Post-adoption 512^3 stage split at the FINAL tum512 stack (VERDICT r4
item 8) + saturated-FREE-skip cost bounds (item 2 groundwork).

Round 4 shipped free_fold + weight_dtype bf16 + max_weight 128 + caps
28672/8192 + hier_classify 4 + color_every 3 at 34.0-34.6 ms/frame, but the
ledger has no stage decomposition AT that configuration (the analogous
published split is the paper's 31.1/21.6 ms, bylow_etal_rss2013 SV-E).
This probe produces it by differencing fuse variants:

  * fuse(color)/fuse(-color)          -> color share (cadence-weighted)
  * fuse(cap_free=64)                 -> FREE-row share of the folded merge
  * fuse(cap=4096)                    -> per-FULL-brick share
  * fuse(cap=64, cap_free=64)         -> classify + fixed dispatch floor
  * track @ forced iters              -> per-GN-iteration cost

All loops are k-dependent (pose perturbed by k*1e-6 — LICM-proofed) and
every rep fetches a scalar to stop the clock (the tunnel's
block_until_ready no-op, CLAUDE.md).

Saturated-FREE groundwork: maintaining a per-brick saturated bitset costs
two 1D scatters per frame (clear cap FULL ids, set <=cap_free FREE ids).
The microprobe times `S.at[ids].set` at those shapes so the skip's
bookkeeping cost is known before building it.
"""
import os
import sys
import time

os.environ.setdefault("BENCH_PRESET", "tum512")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.fusion.brickmajor import (
    brick_masked_view, fuse_frame_brickmajor)
from tracking_sdf_tpu.tracking.gauss_newton import track_frame

K = 10
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, tcfg = cfg.grid, cfg.tracking
fcfg0 = cfg.fusion._replace(mode="bricked")
vdt = jnp.bfloat16 if fcfg0.storage_dtype == "bfloat16" else None
bg0 = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
pose0 = poses[0]
print(f"# preset caps {fcfg0.brick_cap}/{fcfg0.brick_cap_free} "
      f"hier={fcfg0.hier_classify} ce={fcfg0.color_every} "
      f"share={fcfg0.pixel_share}x{fcfg0.pixel_share_j}", flush=True)


def fuse_variant(label, cap, cap_free, color=True, fcfg=None):
    fcfg = (fcfg or fcfg0)

    @jax.jit
    def fuse_k(bg, pose):
        def body(k, bg):
            bg2, _, _ = fuse_frame_brickmajor(
                bg, Pose(pose.R, pose.t + 1e-6 * k), PTS[k % B.K],
                NRM[k % B.K], rgb if color else None, params=params,
                cam=cam, cfg=fcfg, bs=(8, 8, 8), cap=cap,
                cap_free=cap_free, emit_dm=False)
            return bg2
        return jax.lax.fori_loop(0, K, body, bg)

    out = fuse_k(bg0, pose0)
    _ = float(out.W.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fuse_k(out, pose0)
        _ = float(out.W.ravel()[0])  # force: tunnel no-ops block_until_ready
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:52s} {best*1e3:8.2f} ms", flush=True)
    return best


def track_variant(label, n_iters):
    t = tcfg._replace(max_iterations=n_iters, max_twist_diff=0.0)
    Dm0 = brick_masked_view(bg0, params, (8, 8, 8))

    @jax.jit
    def run(Dm, pose):
        def body(k, p):
            res = track_frame(None, Pose(p.R, p.t + 1e-6 * k),
                              PTS_S[k % B.K], params=params, cfg=t, Dm=Dm)
            return res.pose
        return jax.lax.fori_loop(0, K, body, pose)

    p = run(Dm0, pose0)
    _ = float(p.t[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p = run(Dm0, p)
        _ = float(p.t[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:52s} {best*1e3:8.2f} ms", flush=True)
    return best


cap, capf = fcfg0.brick_cap, fcfg0.brick_cap_free
f_color = fuse_variant("fuse preset caps +color", cap, capf, True)
f_nocol = fuse_variant("fuse preset caps -color", cap, capf, False)
f_nofree = fuse_variant("fuse cap_free=64 (-FREE rows) -color", cap, 64,
                        False)
f_nofree_c = fuse_variant("fuse cap_free=64 (-FREE rows) +color", cap, 64,
                          True)
f_smallcap = fuse_variant("fuse cap=4096 (-FULL rows) -color", 4096, capf,
                          False)
f_floor = fuse_variant("fuse cap=64 cap_free=64 (classify+floor) -color",
                       64, 64, False)
for cf in (4096, 2048, 1024):
    fuse_variant(f"fuse cap_free={cf} -color", cap, cf, False)
t4 = track_variant("track 4 forced GN iters", 4)
t8 = track_variant("track 8 forced GN iters", 8)

ce = max(fcfg0.color_every, 1)
frame_fuse = (f_color + (ce - 1) * f_nocol) / ce
print("# ---- derived split (ms/frame at ce=%d) ----" % ce, flush=True)
print(f"#   fuse cadence-weighted       {frame_fuse*1e3:7.2f}")
print(f"#   color share (on color frm)  {(f_color-f_nocol)*1e3:7.2f}")
print(f"#   FREE-row share (-color)     {(f_nocol-f_nofree)*1e3:7.2f}")
print(f"#   FULL-row share (-color)     {(f_nocol-f_smallcap)*1e3:7.2f}")
print(f"#   classify+floor              {f_floor*1e3:7.2f}")
print(f"#   track per-GN-iter           {(t8-t4)/4*1e3:7.2f}")

# ---- 1D scatter microprobe: saturated-bitset maintenance cost ----------
m = params.m
NB = (m // 8) ** 3
for n_ids, tag in ((cap, f"clear FULL ids ({cap})"),
                   (capf, f"set FREE ids ({capf})")):
    S0 = jnp.zeros((NB,), jnp.uint8)
    ids0 = (jnp.arange(n_ids, dtype=jnp.int32) * 37) % NB

    @jax.jit
    def scat_k(S, ids):
        def body(k, S):
            rows = (ids + k) % NB  # k-dependent: LICM-proofed
            return S.at[rows].set(jnp.uint8(1), mode="drop")
        return jax.lax.fori_loop(0, K, body, S)

    S = scat_k(S0, ids0)
    _ = int(S[0])
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        S = scat_k(S, ids0)
        _ = int(S[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"1D u8 scatter {tag:38s} {best*1e3:8.3f} ms", flush=True)

# same, but 2D-shaped (NB,1) rows — the fast-gather shape rule may apply
for n_ids, tag in ((cap, f"clear FULL ids ({cap})"),
                   (capf, f"set FREE ids ({capf})")):
    S0 = jnp.zeros((NB, 1), jnp.uint8)
    ids0 = (jnp.arange(n_ids, dtype=jnp.int32) * 37) % NB
    ones = jnp.ones((n_ids, 1), jnp.uint8)

    @jax.jit
    def scat2_k(S, ids):
        def body(k, S):
            rows = (ids + k) % NB
            return S.at[rows].set(ones, mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, K, body, S)

    S = scat2_k(S0, ids0)
    _ = int(S[0, 0])
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        S = scat2_k(S, ids0)
        _ = int(S[0, 0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"(NB,1) u8 row-scatter {tag:30s} {best*1e3:8.3f} ms", flush=True)
