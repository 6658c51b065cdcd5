"""Probe: where track_frame's time goes (fixed 3.8 ms + 1.9 ms/iter).

Times isolated stages K times in one on-device fori_loop (k-dependent pose
to defeat LICM), best of 3:
  * residuals only (gathers + interp math)
  * residuals + normal equations (adds the (6,N)x(N,6) MXU contraction)
  * + 6x6 linalg.solve
  * + hand-rolled 6x6 Cholesky solve (candidate replacement)
  * full track_frame at 1 forced iteration (= the 5.75 ms being explained)
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
    normal_equations, pixel_residuals_analytic, track_frame)
from tracking_sdf_tpu.core.lie import Pose

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, tcfg = cfg.grid, cfg.tracking
dense0 = B._bootstrap(cfg, cam, poses, rgb)
Dm0 = masked_view(dense0.D, dense0.W)
pose0 = poses[0]
pts = PTS_S[0]


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:44s} {best*1e3:8.3f} ms", flush=True)
    return best


def perturb(pose, k):
    return Pose(pose.R, pose.t + 1e-6 * k)


@jax.jit
def run_resid(Dm, pose):
    def body(k, acc):
        phi, Jc, mask = pixel_residuals_analytic(
            None, perturb(pose, k), pts, params=params, Dm=Dm)
        return acc + phi[0] + Jc[0, 0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


@jax.jit
def run_normeq(Dm, pose):
    def body(k, acc):
        phi, Jc, mask = pixel_residuals_analytic(
            None, perturb(pose, k), pts, params=params, Dm=Dm)
        A, b = normal_equations(phi, Jc, mask)
        return acc + A[0, 0] + b[0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


@jax.jit
def run_solve(Dm, pose):
    def body(k, acc):
        phi, Jc, mask = pixel_residuals_analytic(
            None, perturb(pose, k), pts, params=params, Dm=Dm)
        A, b = normal_equations(phi, Jc, mask)
        A = A + 0.1 * jnp.diag(jnp.diag(A)) + 1e-12 * jnp.eye(6)
        tw = jnp.linalg.solve(A, b)
        return acc + tw[0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


def chol_solve6(A, b):
    """Unrolled 6x6 Cholesky solve — pure VPU scalar ops, no LU pivoting."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for p in range(j):
            s = s - L[j][p] * L[j][p]
        L[j][j] = jnp.sqrt(s)
        for i in range(j + 1, n):
            s = A[i, j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for p in range(i):
            s = s - L[i][p] * y[p]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for p in range(i + 1, n):
            s = s - L[p][i] * x[p]
        x[i] = s / L[i][i]
    return jnp.stack(x)


@jax.jit
def run_chol(Dm, pose):
    def body(k, acc):
        phi, Jc, mask = pixel_residuals_analytic(
            None, perturb(pose, k), pts, params=params, Dm=Dm)
        A, b = normal_equations(phi, Jc, mask)
        A = A + 0.1 * jnp.diag(jnp.diag(A)) + 1e-12 * jnp.eye(6)
        tw = chol_solve6(A, b)
        return acc + tw[0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


t1cfg = tcfg._replace(max_iterations=1, max_twist_diff=0.0)


@jax.jit
def run_track1(Dm, pose):
    def body(k, acc):
        r = track_frame(None, perturb(pose, k), pts, params=params,
                        cfg=t1cfg, Dm=Dm)
        return acc + r.final_twist[0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


r = timeit("residuals only", run_resid, Dm0, pose0)
n = timeit("residuals + normal equations", run_normeq, Dm0, pose0)
s = timeit("+ linalg.solve 6x6", run_solve, Dm0, pose0)
c = timeit("+ unrolled cholesky 6x6", run_chol, Dm0, pose0)
t = timeit("full track_frame, 1 forced iter", run_track1, Dm0, pose0)
print(f"  -> normal-eq: {(n-r)*1e3:.3f} ms; linalg.solve: {(s-n)*1e3:.3f} ms; "
      f"cholesky: {(c-n)*1e3:.3f} ms; while_loop+rest: {(t-s)*1e3:.3f} ms")
