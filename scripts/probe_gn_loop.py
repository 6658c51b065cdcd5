"""Probe: GN loop machinery cost + pixel-count scaling of the residual pass.

  * track_frame forced to 0 iterations (cond false at entry) — isolates the
    while_loop wrapper / dispatch overhead from the body cost.
  * while_loop (5 forced iters) vs an unrolled fixed 5-iteration loop —
    isolates per-iteration cond/carry overhead.
  * residual pass at N in {8.6k, 19k, 34k, 77k} pixels — does the ~3.3 ms
    gather floor scale with batch size (pyramid viability)?
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.grid.interp import masked_view
from tracking_sdf_tpu.tracking.gauss_newton import (
    _apply_update, normal_equations, pixel_residuals_analytic, track_frame)
from tracking_sdf_tpu.core.lie import Pose

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, tcfg = cfg.grid, cfg.tracking
dense0 = B._bootstrap(cfg, cam, poses, rgb)
Dm0 = masked_view(dense0.D, dense0.W)
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
    print(f"{name:40s} {best*1e3:8.3f} ms", flush=True)
    return best


def perturb(pose, k):
    return Pose(pose.R, pose.t + 1e-6 * k)


def make_track(n_iters):
    t = tcfg._replace(max_iterations=n_iters, max_twist_diff=0.0)

    @jax.jit
    def run(Dm, pose):
        def body(k, acc):
            r = track_frame(None, perturb(pose, k), PTS_S[0], params=params,
                            cfg=t, Dm=Dm)
            return acc + r.final_twist[0] + r.pose.t[0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    return run


def gn_unrolled(Dm, pose, n):
    lam = jnp.float32(tcfg.damping)
    tw = None
    for _ in range(n):
        phi, Jc, mask = pixel_residuals_analytic(
            None, pose, PTS_S[0], params=params, Dm=Dm)
        A, b = normal_equations(phi, Jc, mask)
        A = A + lam * jnp.diag(jnp.diag(A)) + 1e-12 * jnp.eye(6)
        tw = jnp.linalg.solve(A, b)
        tw = jnp.where(jnp.all(jnp.isfinite(tw)), tw, jnp.zeros_like(tw))
        pose = _apply_update(pose, tw, tcfg.pose_update)
    return pose, tw


def make_unrolled(n):
    @jax.jit
    def run(Dm, pose):
        def body(k, acc):
            p, tw = gn_unrolled(Dm, perturb(pose, k), n)
            return acc + tw[0] + p.t[0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    return run


t0i = timeit("track while_loop forced 0 iters", make_track(0), Dm0, pose0)
t1i = timeit("track while_loop forced 1 iter", make_track(1), Dm0, pose0)
t5i = timeit("track while_loop forced 5 iters", make_track(5), Dm0, pose0)
u1 = timeit("unrolled 1 iter", make_unrolled(1), Dm0, pose0)
u5 = timeit("unrolled 5 iters", make_unrolled(5), Dm0, pose0)
print(f"  -> while wrapper: {t0i*1e3:.2f} ms; while per-iter "
      f"{(t5i-t1i)/4*1e3:.2f} vs unrolled per-iter {(u5-u1)/4*1e3:.2f} ms")

# ---- residual pass vs pixel count ----------------------------------------
for stride_mult, label in ((4, "8.6k"), (2, "19k"), (1, "34k")):
    pts = PTS[0][::3 * stride_mult, ::3 * stride_mult].reshape(-1, 3)

    @jax.jit
    def run(Dm, pose, pts=pts):
        def body(k, acc):
            phi, Jc, m = pixel_residuals_analytic(
                None, perturb(pose, k), pts, params=params, Dm=Dm)
            return acc + phi[0] + Jc[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    timeit(f"residuals N={label} ({pts.shape[0]})", run, Dm0, pose0)
