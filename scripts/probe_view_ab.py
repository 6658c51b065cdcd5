"""A/B: flat-Dm tracking (pre-view semantics) vs BrickMaskedView tracking,
plus the pixel_share 2x2 candidate — bench.py's exact 10-frame loop.

Purpose 1 (regression check): "flat" and "view" must produce identical
trajectories (the corner fetch is parity-tested bit-exact; any difference
here means the bench wiring, not the kernel, changed semantics).
Purpose 2: measure share 2x2 (pixel_share=2, pixel_share_j=2) end-to-end:
fuse gather rows halve again; |t err| shows the closed-loop accuracy cost.
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
from tracking_sdf_tpu.grid.interp import masked_view
from tracking_sdf_tpu.tracking.pyramid import track_frame_pyramid

cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, tcfg = cfg.grid, cfg.tracking
bs = (8, 8, 8)
K = B.K

dense0 = B._bootstrap(cfg, cam, poses, rgb)
bg0 = brick_grid_from_dense(dense0, bs)
jax.block_until_ready(bg0.D)


def make_run(emit_dm, share_j):
    fcfg = cfg.fusion._replace(mode="bricked", pixel_share_j=share_j)

    def frame(state, p1, k):
        bgrid, Dm = state
        res, _ = track_frame_pyramid(
            None, p1, PTS[k], params=params, cfg=tcfg,
            levels=cfg.pyramid_levels, Dm=Dm)
        bgrid, Dm, _ = fuse_frame_brickmajor(
            bgrid, res.pose, PTS[k], NRM[k], rgb, params=params, cam=cam,
            cfg=fcfg, bs=bs, cap=fcfg.brick_cap, cap_free=2048,
            emit_dm=emit_dm)
        return (bgrid, Dm), res

    @jax.jit
    def run_k(state, pose_prev):
        def body(k, carry):
            state, p1, iters = carry
            state, res = frame(state, p1, k)
            return (state, res.pose, iters + res.iterations)
        return jax.lax.fori_loop(0, K, body, (state, pose_prev, jnp.int32(0)))
    return run_k


def measure(name, run_k, state0):
    state, pose_out, iters = run_k(state0, poses[0])
    jax.block_until_ready(state[0].D)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s, p_out, it = run_k(state0, poses[0])
        _ = float(s[0].D.ravel()[0])
        best = min(best, (time.perf_counter() - t0) / K)
    err = float(jnp.linalg.norm(p_out.t - poses[K].t))
    print(f"{name:12s} {best*1e3:7.2f} ms/frame  {1/best:6.2f} fps  "
          f"{int(it)} GN iters/{K}f  |t err| {err*1e3:6.1f} mm", flush=True)
    return p_out


state_flat = (bg0, masked_view(dense0.D, dense0.W))
state_view = (bg0, brick_masked_view(bg0, params, bs))

p_flat = measure("flat-dm", make_run(True, 1), state_flat)
p_view = measure("view-dm", make_run("view", 1), state_view)
d = float(jnp.max(jnp.abs(p_flat.t - p_view.t)))
print(f"  flat vs view |dt| = {d*1e3:.4f} mm (expect 0)")
measure("view+sj2", make_run("view", 2), state_view)
