"""Probe: tracking cost breakdown in the CURRENT hot configuration
(pyramid (2,1), BrickMaskedView Dm, 256^3) — on-device K-loops, k-perturbed
pose (LICM guard), best of 3.

Stages:
  pyr21      : track_frame_pyramid exactly as bench runs it
  fine-only  : levels (1,) — the stride-3 level alone
  coarse-only: levels (2,) won't typecheck (must end at 1) -> call
               track_frame directly at stride 6 with coarse config
  gn1-fine   : ONE forced GN iteration at stride 3 (max_iterations=1)
  gn1-coarse : ONE forced GN iteration at stride 6
  resid-fine : residuals+normal-equations only at stride 3 (no while_loop)
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.fusion.brickmajor import (
    brick_grid_from_dense, brick_masked_view)
from tracking_sdf_tpu.tracking.gauss_newton import (
    normal_equations, pixel_residuals_analytic, track_frame)
from tracking_sdf_tpu.tracking.pyramid import track_frame_pyramid

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, tcfg = cfg.grid, cfg.tracking
bs = (8, 8, 8)
dense0 = B._bootstrap(cfg, cam, poses, rgb)
bg0 = brick_grid_from_dense(dense0, bs)
Dm = brick_masked_view(bg0, params, bs)
pose0 = poses[1]
pts_img = PTS[0]
pts3 = PTS[0, ::3, ::3].reshape(-1, 3)
pts6 = PTS[0, ::6, ::6].reshape(-1, 3)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:14s} {best*1e3:8.3f} ms", flush=True)
    return best


def perturb(pose, k):
    return Pose(pose.R, pose.t + 1e-6 * k)


def loop(body):
    @jax.jit
    def run(pose):
        return jax.lax.fori_loop(
            0, K, lambda k, acc: acc + body(perturb(pose, k), k),
            jnp.float32(0.0))
    return run


def t_pyr(p, k):
    res, _ = track_frame_pyramid(None, p, pts_img, params=params, cfg=tcfg,
                                 levels=cfg.pyramid_levels, Dm=Dm)
    return res.pose.t[0] + res.iterations.astype(jnp.float32)


def t_fine(p, k):
    res = track_frame(None, p, pts3, params=params, cfg=tcfg, Dm=Dm)
    return res.pose.t[0] + res.iterations.astype(jnp.float32)


coarse_cfg = tcfg._replace(max_iterations=10)


def t_coarse(p, k):
    res = track_frame(None, p, pts6, params=params, cfg=coarse_cfg, Dm=Dm)
    return res.pose.t[0] + res.iterations.astype(jnp.float32)


gn1 = tcfg._replace(max_iterations=1, max_twist_diff=0.0)


def t_gn1f(p, k):
    res = track_frame(None, p, pts3, params=params, cfg=gn1, Dm=Dm)
    return res.pose.t[0]


def t_gn1c(p, k):
    res = track_frame(None, p, pts6, params=params, cfg=gn1, Dm=Dm)
    return res.pose.t[0]


def t_resid(p, k):
    phi, J, mask = pixel_residuals_analytic(None, p, pts3, params=params, Dm=Dm)
    A, b = normal_equations(phi, J, mask)
    return A[0, 0] + b[0]


def t_residc(p, k):
    phi, J, mask = pixel_residuals_analytic(None, p, pts6, params=params, Dm=Dm)
    A, b = normal_equations(phi, J, mask)
    return A[0, 0] + b[0]


h = timeit("floor", loop(lambda p, k: p.t[0]), pose0)
timeit("pyr21", loop(t_pyr), pose0)
timeit("fine-only", loop(t_fine), pose0)
timeit("coarse-only", loop(t_coarse), pose0)
timeit("gn1-fine", loop(t_gn1f), pose0)
timeit("gn1-coarse", loop(t_gn1c), pose0)
timeit("resid-fine", loop(t_resid), pose0)
timeit("resid-coarse", loop(t_residc), pose0)
