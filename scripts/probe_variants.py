"""A/B full-frame variants on hardware: pixel_share and pyramid tracking.

Runs bench.py's exact 10-frame tracked+fused on-device loop for:
  base      : tum256 preset as-is (brickmajor, pixel_share=2)
  share4    : pixel_share=4
  pyr41     : pyramid levels (4, 1) — coarse GN at stride 12 first
  pyr21     : pyramid levels (2, 1)
Each prints ms/frame (best of 3) + final pose error vs groundtruth so an
accuracy regression is visible immediately.
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.fusion.brickmajor import (
    brick_grid_from_dense, fuse_frame_brickmajor)
from tracking_sdf_tpu.grid.interp import masked_view
from tracking_sdf_tpu.tracking.gauss_newton import track_frame

cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, tcfg = cfg.grid, cfg.tracking
bs = (8, 8, 8)
K = B.K

dense0 = B._bootstrap(cfg, cam, poses, rgb)
state0 = (brick_grid_from_dense(dense0, bs), masked_view(dense0.D, dense0.W))
jax.block_until_ready(state0[0].D)

# per-level strided points for the pyramid variants (stride = 3 * mult)
PTS_L = {mult: PTS[:, ::3 * mult, ::3 * mult].reshape(K, -1, 3)
         for mult in (1, 2, 4)}


def make_run(share, levels):
    fcfg = cfg.fusion._replace(mode="bricked", pixel_share=share)

    def frame(state, p1, k):
        bgrid, Dm = state
        pose = p1
        for mult in levels:
            lcfg = tcfg if mult == 1 else tcfg._replace(max_iterations=10)
            res = track_frame(None, pose, PTS_L[mult][k], params=params,
                              cfg=lcfg, Dm=Dm)
            pose = res.pose
        bgrid, Dm, _ = fuse_frame_brickmajor(
            bgrid, res.pose, PTS[k], NRM[k], rgb, params=params, cam=cam,
            cfg=fcfg, bs=bs, cap=fcfg.brick_cap, cap_free=2048)
        return (bgrid, Dm), res

    @jax.jit
    def run_k(state, pose_prev):
        def body(k, carry):
            state, p1, iters = carry
            state, res = frame(state, p1, k)
            return (state, res.pose, iters + res.iterations)
        return jax.lax.fori_loop(0, K, body, (state, pose_prev, jnp.int32(0)))
    return run_k


def measure(name, run_k):
    state, pose_out, iters = run_k(state0, poses[0])
    jax.block_until_ready(state[0].D)
    best = float("inf")
    s = state
    for _ in range(3):
        t0 = time.perf_counter()
        s, p_out, it = run_k(state0, poses[0])
        _ = float(s[0].D.ravel()[0])
        best = min(best, (time.perf_counter() - t0) / K)
    err = float(jnp.linalg.norm(p_out.t - poses[K].t))
    print(f"{name:10s} {best*1e3:7.2f} ms/frame  {1/best:6.2f} fps  "
          f"{int(it)} GN iters/{K}f  |t err| {err*1e3:6.1f} mm", flush=True)


measure("base", make_run(2, (1,)))
measure("share4", make_run(4, (1,)))
measure("pyr41", make_run(2, (4, 1)))
measure("pyr21", make_run(2, (2, 1)))
