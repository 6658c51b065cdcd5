"""TPU A/B: fused Pallas GN reduction vs the XLA path (VERDICT r1 item 8).

Times, per GN iteration at the production query count (34k stride-3
pixels, 256^3 brick-major view):
  1. production pixel_residuals_analytic + normal_equations
  2. corner-gather front half only (bounds the irreducible gather cost)
  3. front half + XLA post-math (should ~= 1)
  4. front half + Pallas fused post-math kernel
(4) - (2) vs (3) - (2) is the Pallas-vs-XLA contest on the only part a
kernel can influence; (2) vs (1) quantifies the gather share for the
roofline writeup.
"""
import sys
import time

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
    normal_equations, pixel_residuals_analytic)
from tracking_sdf_tpu.tracking.pallas_gn import (
    gather_corner_inputs, gn_reduce_pallas, gn_reduce_xla)

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
vdt = jnp.bfloat16 if cfg.fusion.storage_dtype == "bfloat16" else None
bg = brick_grid_from_dense(B._bootstrap(cfg, cam, poses, rgb), (8, 8, 8),
                           value_dtype=vdt)
Dm = brick_masked_view(bg, params, (8, 8, 8))
pose0 = poses[0]
pts = PTS_S[0]
print(f"queries: {pts.shape[0]}", flush=True)


def timeit(label, run):
    float(run(pose0))
    best = float("inf")
    for rep in range(1, 4):  # varied inputs + VALUE fetch (tunnel gotchas)
        p = Pose(pose0.R, pose0.t + 1e-5 * rep)
        t0 = time.perf_counter()
        float(run(p))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:44s} {best*1e3:8.3f} ms/iter", flush=True)
    return best


@jax.jit
def prod(pose):
    def body(k, acc):
        p = Pose(pose.R, pose.t + 1e-7 * k)
        phi, J, mask = pixel_residuals_analytic(None, p, pts, params=params,
                                                Dm=Dm)
        A, b = normal_equations(phi, J, mask)
        return acc + A[0, 0] + b[0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


@jax.jit
def front(pose):
    def body(k, acc):
        p = Pose(pose.R, pose.t + 1e-7 * k)
        d_raw, inb, f, a, vin, scale = gather_corner_inputs(
            Dm, p, pts, params=params)
        # full reductions force the gather without the GN math
        return acc + jnp.nansum(d_raw) + jnp.sum(f)
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


@jax.jit
def front_xla(pose):
    def body(k, acc):
        p = Pose(pose.R, pose.t + 1e-7 * k)
        d_raw, inb, f, a, vin, scale = gather_corner_inputs(
            Dm, p, pts, params=params)
        A, b = gn_reduce_xla(d_raw, inb, f, a, vin, scale)
        return acc + A[0, 0] + b[0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


@jax.jit
def front_pallas(pose):
    def body(k, acc):
        p = Pose(pose.R, pose.t + 1e-7 * k)
        d_raw, inb, f, a, vin, scale = gather_corner_inputs(
            Dm, p, pts, params=params)
        A, b = gn_reduce_pallas(d_raw, inb, f, a, vin, scale)
        return acc + A[0, 0] + b[0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


# numeric sanity on hardware before timing
d_raw, inb, f, a, vin, scale = gather_corner_inputs(Dm, pose0, pts,
                                                    params=params)
A_x, b_x = gn_reduce_xla(d_raw, inb, f, a, vin, scale)
A_p, b_p = gn_reduce_pallas(d_raw, inb, f, a, vin, scale)
err = float(jnp.max(jnp.abs(A_p - A_x)) / (jnp.max(jnp.abs(A_x)) + 1e-9))
print(f"pallas-vs-xla max rel err: {err:.2e}", flush=True)

t1 = timeit("1. production (residuals+normal eqs)", prod)
t2 = timeit("2. corner-gather front half only", front)
t3 = timeit("3. front + XLA post-math", front_xla)
t4 = timeit("4. front + Pallas fused kernel", front_pallas)
print(f"  -> gather share: {100*t2/t1:.0f}% of production; post-math "
      f"XLA {1e3*(t3-t2):.3f} ms vs Pallas {1e3*(t4-t2):.3f} ms", flush=True)
