"""512^3 merge-tail re-A/B (round 4, VERDICT r3 'do this' #3).

The two alternative merge formulations — fusion/packed.py (one-array, one
gather/one scatter for all 6 channels) and fusion/pallas_merge.py (in-place
active-brick kernel) — were measured and REJECTED at 256^3 only; at 512^3
the merge tail's share of frame time is ~3x larger and the balance may
flip. This probe measures fuse-only 10-frame on-device loops (tum512
preset inputs, k-dependent poses per the LICM rule, forced value fetches)
for:

  bm-preset      brickmajor, the shipped tum512 fuse config (hier=4, bf16,
                 share 4x4, color every frame = the color-ON row)
  bm-fold        + free_fold (FREE rows folded into the FULL D/W pass)
  bm-flat-cls    hier off (classify share)
  bm-nocolor     color off (color share)
  bm-f32         storage f32 (dtype share at 512^3)
  packed-f32     fusion/packed.py (NB, 6, BV) one-gather/one-scatter
  flat-xla       flat-layout bricked (1, 8, 128), merge="xla"
  flat-pallas    flat-layout bricked, merge="pallas" in-place kernel

Each variant prints ms/frame + overflow stats; failures are reported and
skipped (the ledger needs the number OR the reason).
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

K = 10
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
pose0 = poses[0]
CAP, CAPF = cfg.fusion.brick_cap, cfg.fusion.brick_cap_free


def timed_loop(label, make_state, fuse_k, stats_fn=None):
    try:
        t0 = time.time()
        state = make_state()
        jax.block_until_ready(jax.tree.leaves(state)[0])
        out = fuse_k(state, pose0)
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        compile_s = time.time() - t0
        best = float("inf")
        for rep in (1, 2, 3):
            p = Pose(pose0.R, pose0.t + jnp.float32(rep * 1e-7))
            t0 = time.perf_counter()
            out = fuse_k(out, p)
            _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / K)
        extra = stats_fn(out) if stats_fn else ""
        print(f"{label:14s} {best*1e3:8.2f} ms/frame  "
              f"(compile+boot {compile_s:.0f}s){extra}", flush=True)
        del out, state
    except Exception as e:
        print(f"{label:14s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def bm_variant(label, color=True, vdt="preset", **over):
    from tracking_sdf_tpu.fusion.brickmajor import fuse_frame_brickmajor

    fcfg = cfg.fusion._replace(mode="bricked", **over)
    dt = (jnp.bfloat16 if (vdt == "preset" and
                           cfg.fusion.storage_dtype == "bfloat16")
          else None)

    @jax.jit
    def fuse_k(bg, pose):
        def body(k, bg):
            bg2, _, _ = fuse_frame_brickmajor(
                bg, Pose(pose.R, pose.t + 1e-6 * k), PTS[k % K],
                NRM[k % K], rgb if color else None, params=params, cam=cam,
                cfg=fcfg._replace(fuse_color=color), bs=(8, 8, 8), cap=CAP,
                cap_free=CAPF or None, emit_dm="view")
            return bg2
        return jax.lax.fori_loop(0, K, body, bg)

    timed_loop(label,
               lambda: B._bootstrap_brickmajor(cfg, cam, poses, rgb, dt),
               fuse_k)


def packed_variant():
    from tracking_sdf_tpu.fusion.packed import (
        empty_packed_grid, fuse_frame_packed)

    fcfg = cfg.fusion._replace(mode="bricked")

    def boot():
        pg = empty_packed_grid(params, (8, 8, 8))
        pg, _, _ = fuse_frame_packed(
            pg, poses[0], PTS[0], NRM[0], rgb, params=params, cam=cam,
            cfg=fcfg, bs=(8, 8, 8), cap=CAP, cap_free=CAPF or None,
            emit_dm=False)
        return pg

    @jax.jit
    def fuse_k(pg, pose):
        def body(k, pg):
            pg2, _, _ = fuse_frame_packed(
                pg, Pose(pose.R, pose.t + 1e-6 * k), PTS[k % K],
                NRM[k % K], rgb, params=params, cam=cam, cfg=fcfg,
                bs=(8, 8, 8), cap=CAP, cap_free=CAPF or None,
                emit_dm=False)
            return pg2
        return jax.lax.fori_loop(0, K, body, pg)

    timed_loop("packed-f32", boot, fuse_k)


def flat_variant(label, merge, cap=49152, cap_act=None):
    from tracking_sdf_tpu.fusion.brick import fuse_frame_bricked
    from tracking_sdf_tpu.grid.grid import empty_grid

    fcfg = cfg.fusion._replace(mode="bricked")
    bs = (1, 8, 128)

    def boot():
        g = empty_grid(params)
        g, st = fuse_frame_bricked(
            g, poses[0], PTS[0], NRM[0], rgb, params=params, cam=cam,
            cfg=fcfg, bs=bs, cap=cap, merge="xla")
        print(f"  [{label} boot overflow={int(st.overflow)} "
              f"n_full={int(st.n_full)} n_free={int(st.n_free)}]",
              flush=True)
        return g

    @jax.jit
    def fuse_k(g, pose):
        def body(k, g):
            g2, _ = fuse_frame_bricked(
                g, Pose(pose.R, pose.t + 1e-6 * k), PTS[k % K], NRM[k % K],
                rgb, params=params, cam=cam, cfg=fcfg, bs=bs, cap=cap,
                merge=merge, cap_act=cap_act)
            return g2
        return jax.lax.fori_loop(0, K, body, g)

    timed_loop(label, boot, fuse_k)


print(f"# 512^3 merge-tail A/B: preset caps {CAP}/{CAPF}, "
      f"share {cfg.fusion.pixel_share}x{cfg.fusion.pixel_share_j}, "
      f"hier {cfg.fusion.hier_classify}", flush=True)
bm_variant("bm-preset")
bm_variant("bm-fold", free_fold=True)
bm_variant("bm-flat-cls", hier_classify=0)
bm_variant("bm-nocolor", color=False)
bm_variant("bm-fold-nc", color=False, free_fold=True)
bm_variant("bm-f32", vdt="f32")
packed_variant()
flat_variant("flat-xla", "xla")
flat_variant("flat-pallas", "pallas", cap_act=196608)
print("# done", flush=True)
