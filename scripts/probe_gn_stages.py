"""Profile one GN tracking iteration stage by stage on hardware.

Cumulative-stage timing (each probe runs stages 1..s) with k-dependent pose
perturbations so nothing hoists; differences give per-stage cost.

Stages:
  1 transform+coords   world transform + world_to_voxel + bounds mask
  2 + corner fetch     trilinear_with_grad_nan (value+grad+valid)
  3 + J build          scale, cross product, concat
  4 + normal eqs       masked einsums -> A (6,6), b (6)
  5 + solve+exp        damped solve, se3_exp, pose update (full iteration)
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tracking_sdf_tpu.config import preset
from tracking_sdf_tpu.core.lie import Pose, se3_exp
from tracking_sdf_tpu.grid.grid import world_to_voxel
from tracking_sdf_tpu.grid.interp import masked_view, trilinear_with_grad_nan
from tracking_sdf_tpu.tracking.gauss_newton import _apply_update

cfg = preset("tum256")
params = cfg.grid
M = params.m
N = 34240
KITER = 50
_HI = jax.lax.Precision.HIGHEST

key = jax.random.PRNGKey(0)
D = jax.random.normal(key, (M, M, M), jnp.float32)
W = jax.random.uniform(jax.random.PRNGKey(1), (M, M, M)) - 0.2
Dm = masked_view(D, W)
pts = jax.random.uniform(jax.random.PRNGKey(2), (N, 3), jnp.float32,
                         jnp.asarray([-1.0, -1.0, 0.5]),
                         jnp.asarray([1.0, 1.0, 3.0]))
R0 = jnp.eye(3, dtype=jnp.float32)
t0v = jnp.asarray([0.0, -0.8, 0.8], jnp.float32)


def stage_fn(s):
    def one(pose):
        x = jnp.einsum("ij,nj->ni", pose.R, pts, precision=_HI) + pose.t
        uvw = world_to_voxel(params, x)
        in_b = jnp.all((uvw >= 0) & (uvw < M), axis=-1)
        if s == 1:
            return jnp.sum(uvw) + jnp.sum(in_b)
        phi, g_uvw, ok = trilinear_with_grad_nan(Dm, uvw)
        if s == 2:
            return jnp.sum(phi) + jnp.sum(g_uvw)
        scale = jnp.asarray([M / params.width, M / params.height,
                             M / params.depth], jnp.float32)
        g_world = g_uvw * scale
        a = x - pose.t
        J = jnp.concatenate([g_world, jnp.cross(a, g_world)], axis=-1)
        mask = in_b & ok
        if s == 3:
            return jnp.sum(J) + jnp.sum(mask)
        Jm = jnp.where(mask[:, None], J, 0.0)
        rm = jnp.where(mask, phi, 0.0)
        A = jnp.einsum("ni,nj->ij", Jm, Jm, precision=_HI)
        b = jnp.einsum("ni,n->i", Jm, rm, precision=_HI)
        if s == 4:
            return jnp.sum(A) + jnp.sum(b)
        A = A + 0.1 * jnp.diag(jnp.diag(A)) + 1e-12 * jnp.eye(6)
        twist = jnp.linalg.solve(A, b)
        twist = jnp.where(jnp.all(jnp.isfinite(twist)), twist,
                          jnp.zeros_like(twist))
        pose_new = _apply_update(Pose(R0, t0v), twist, "se3")
        return jnp.sum(pose_new.t) + jnp.sum(pose_new.R)

    @jax.jit
    def run():
        def body(k, acc):
            pose = Pose(R0, t0v + 1e-7 * k)
            return acc + one(pose)
        return jax.lax.fori_loop(0, KITER, body, jnp.float32(0.0))
    return run


print(f"device: {jax.devices()[0].device_kind}  N={N} K={KITER}")
prev = 0.0
names = ["transform+coords", "+corner fetch", "+J build", "+normal eqs",
         "+solve+exp (full iter)"]
for s in range(1, 6):
    run = stage_fn(s)
    _ = float(run())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run())
        best = min(best, (time.perf_counter() - t0) / KITER)
    print(f"stage {s} {names[s-1]:24s} {best*1e3:7.3f} ms  (+{(best-prev)*1e3:6.3f})")
    prev = best
