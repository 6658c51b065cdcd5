"""Probe: where the 38 ms brickmajor frame goes (tracking vs fusion parts).

Times each stage as K k-dependent iterations in ONE on-device fori_loop
dispatch (LICM-proofed: pose perturbed by k*1e-6), best of 3:
  * track @ forced N GN iterations (convergence disabled) -> per-iter cost
  * fuse_frame_brickmajor with emit_dm True/False -> Dm relayout cost
  * fuse at cap=256 vs full cap -> classification + fixed cost vs per-brick
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.fusion.brickmajor import (
    brick_grid_from_dense, brick_masked_view, fuse_frame_brickmajor)
from tracking_sdf_tpu.tracking.gauss_newton import track_frame
from tracking_sdf_tpu.core.lie import Pose

K = 10
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, tcfg, fcfg = cfg.grid, cfg.tracking, cfg.fusion._replace(mode="bricked")
vdt = jnp.bfloat16 if fcfg.storage_dtype == "bfloat16" else None
if cfg.grid.m >= 512:  # dense bootstrap OOMs HBM at 512^3 (bench.py)
    bg0 = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
else:
    bg0 = brick_grid_from_dense(B._bootstrap(cfg, cam, poses, rgb),
                                (8, 8, 8), value_dtype=vdt)
Dm0 = brick_masked_view(bg0, cfg.grid, (8, 8, 8))
pose0 = poses[0]


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)
    return best


def perturb(pose, k):
    return Pose(pose.R, pose.t + 1e-6 * k)


# ---- tracking at forced iteration counts --------------------------------
def make_track(n_iters):
    t = tcfg._replace(max_iterations=n_iters, max_twist_diff=0.0)

    @jax.jit
    def run(Dm, pose):
        def body(k, carry):
            p, acc = carry
            r = track_frame(None, perturb(p, k), PTS_S[k % B.K],
                            params=params, cfg=t, Dm=Dm)
            return (pose, acc + r.final_twist[0])
        return jax.lax.fori_loop(0, K, body, (pose, jnp.float32(0.0)))[1]
    return run


t1 = timeit("track forced 1 iter", make_track(1), Dm0, pose0)
t5 = timeit("track forced 5 iters", make_track(5), Dm0, pose0)
print(f"  -> per-GN-iteration: {(t5 - t1) / 4 * 1e3:.2f} ms, "
      f"fixed: {(t1 - (t5 - t1) / 4) * 1e3:.2f} ms")

# ---- fusion variants -----------------------------------------------------
def make_fuse(cap, cap_free, emit_dm, color):
    @jax.jit
    def run(bg, pose):
        def body(k, bg):
            bg2, Dm, _ = fuse_frame_brickmajor(
                bg, perturb(pose, k), PTS[k % B.K], NRM[k % B.K],
                rgb if color else None,
                params=params, cam=cam, cfg=fcfg, bs=(8, 8, 8),
                cap=cap, cap_free=cap_free, emit_dm=emit_dm)
            if emit_dm is True:  # touch the flat relayout so it isn't DCE'd
                bg2 = bg2._replace(D=bg2.D + 0.0 * Dm[0, 0, 0])
            return bg2
        return jax.lax.fori_loop(0, K, body, bg)
    return run


cap = fcfg.brick_cap
cfree = fcfg.brick_cap_free or cap
f_full = timeit(f"fuse cap={cap} +dm(view) +color",
                make_fuse(cap, cfree, "view", True), bg0, pose0)
f_nodm = timeit(f"fuse cap={cap} -dm +color",
                make_fuse(cap, cfree, False, True), bg0, pose0)
f_nocol = timeit(f"fuse cap={cap} -dm -color",
                 make_fuse(cap, cfree, False, False), bg0, pose0)
f_small = timeit("fuse cap=256 -dm -color", make_fuse(256, 256, False, False),
                 bg0, pose0)
print(f"  -> Dm view: {(f_full - f_nodm)*1e3:.2f} ms; "
      f"color: {(f_nodm - f_nocol)*1e3:.2f} ms; "
      f"per-brick work ({cap - 256} bricks): {(f_nocol - f_small)*1e3:.2f} ms; "
      f"classify+fixed: {f_small*1e3:.2f} ms")
print(f"  -> track(5.2 iters) {(t1 + (t5 - t1)/4*4.2)*1e3:.1f} ms + "
      f"fuse {f_full*1e3:.1f} ms = "
      f"{(t1 + (t5-t1)/4*4.2 + f_full)*1e3:.1f} ms/frame")

# ---- actual brick counts on the bench trajectory (cap sizing) -------------
@jax.jit
def stats_k(bg, pose):
    def body(k, carry):
        bg, nf_max, nr_max = carry
        bg2, _, st = fuse_frame_brickmajor(
            bg, perturb(pose, k), PTS[k % B.K], NRM[k % B.K], rgb,
            params=params, cam=cam, cfg=fcfg, bs=(8, 8, 8),
            cap=cap, cap_free=cfree, emit_dm=False)
        return (bg2, jnp.maximum(nf_max, st.n_full),
                jnp.maximum(nr_max, st.n_free))
    return jax.lax.fori_loop(0, K, body, (bg, jnp.int32(0), jnp.int32(0)))


_, nf, nr = stats_k(bg0, pose0)
print(f"  -> max over {K} frames: n_full {int(nf)} (cap {cap}), "
      f"n_free {int(nr)} (cap_free {cfree})", flush=True)
