"""Classify-stage cost breakdown at 512^3 (round-3 VERDICT item 4 sizing).

classify+fixed is 10.0 ms of the 37.0 ms tum512 fuse (BENCHMARKS.md batch
Y) for 262,144 bricks re-proven from scratch every frame. Before building
hierarchical (super-brick) classification, measure where the 10 ms goes:

  mip     _zeta_mip build (per-image, brick-count independent)
  corner  brick corner + projection + bbox math (elementwise over NB)
  query   the paired 32-lane window gathers (2 rows/brick)
  cls     full classify_bricks
  cls+ids classify + the two nonzero compactions (full_ids, fr_ids)

and the super-brick composition (mixed/free/out counts at factors 4 and 2)
that sizes cap_mixed. All timings: K on-device iterations per dispatch with
k-perturbed poses + per-rep input variation + value fetch (CLAUDE.md probe
rules).
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
from tracking_sdf_tpu.fusion.brick import (
    _brick_corners_cam,
    _query_zeta,
    _zeta_mip,
    classify_bricks,
)

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
bs = cfg.fusion.brick_shape
m = params.m
pose0 = poses[0]
f32 = jnp.float32


def timeit(label, body):
    @jax.jit
    def run(eps):
        def f(k, acc):
            return acc + body(k, eps)
        return jax.lax.fori_loop(0, K, f, jnp.float32(0.0))

    float(run(jnp.float32(0.0)))  # compile + warm
    best = float("inf")
    for rep in range(1, 4):
        e = jnp.float32(rep * 1e-7)
        t0 = time.perf_counter()
        float(run(e))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:34s} {best*1e3:8.3f} ms", flush=True)
    return best


def pose_k(k, eps):
    return Pose(pose0.R, pose0.t + (1e-7 * k + eps))


def finsum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


# ---- mip build only --------------------------------------------------------
def body_mip(k, eps):
    t32, _, _ = _zeta_mip(PTS[k % B.K] + eps, NRM[k % B.K], cam,
                          params.delta, f32)
    return finsum(t32[:4])  # touch, don't reduce the whole table


timeit("zeta/eta mip build", body_mip)


# ---- corners + projection + bbox (no query) --------------------------------
def body_corner(k, eps):
    p = pose_k(k, eps)
    cx_, cy_, cz_ = _brick_corners_cam(params, p, bs, f32, m // bs[0], 0)
    pz_min = cz_.min(-1)
    pz_max = cz_.max(-1)
    safe_z = jnp.where(cz_ > 0, cz_, 1.0)
    u_c = (cam.fx * cx_ + cam.cx * cz_) / safe_z
    v_c = (cam.fy * cy_ + cam.cy * cz_) / safe_z
    u0, u1 = u_c.min(-1), u_c.max(-1)
    v0, v1 = v_c.min(-1), v_c.max(-1)
    return (finsum(pz_min) + finsum(pz_max) + finsum(u0) + finsum(u1)
            + finsum(v0) + finsum(v1))


timeit("corner+projection+bbox", body_corner)


# ---- full classify ----------------------------------------------------------
def body_cls(k, eps):
    cls = classify_bricks(params, pose_k(k, eps), PTS[k % B.K], NRM[k % B.K],
                          cam, bs, f32, m // bs[0], 0)
    return jnp.sum(cls).astype(jnp.float32)


timeit("classify_bricks (full)", body_cls)


# ---- classify + the two nonzero compactions --------------------------------
cap = cfg.fusion.brick_cap
cap_free = cfg.fusion.brick_cap_free or cap
NB = (m // bs[0]) * (m // bs[1]) * (m // bs[2])


def body_ids(k, eps):
    cls = classify_bricks(params, pose_k(k, eps), PTS[k % B.K], NRM[k % B.K],
                          cam, bs, f32, m // bs[0], 0).reshape(-1)
    full_ids = jnp.nonzero(cls == 2, size=cap, fill_value=NB)[0]
    fr_ids = jnp.nonzero(cls == 1, size=cap_free, fill_value=NB)[0]
    return (full_ids.sum() + fr_ids.sum()).astype(jnp.float32)


timeit("classify + nonzero ids", body_ids)


# ---- super-brick composition (sizes cap_mixed) ------------------------------
for f in (4, 2):
    sbs = (bs[0] * f, bs[1] * f, bs[2] * f)
    counts = {0: [], 1: [], 2: []}
    for k in range(B.K):
        cls = classify_bricks(params, poses[k + 1], PTS[k], NRM[k], cam,
                              sbs, f32, m // sbs[0], 0)
        flat = jnp.reshape(cls, (-1,))
        for c in counts:
            counts[c].append(int(jnp.sum(flat == c)))
    tot = (m // sbs[0]) * (m // sbs[1]) * (m // sbs[2])
    print(f"super x{f}: total {tot}  out {min(counts[0])}-{max(counts[0])} "
          f" free {min(counts[1])}-{max(counts[1])} "
          f" mixed {min(counts[2])}-{max(counts[2])}", flush=True)

# fine-level composition for reference
counts = {0: [], 1: [], 2: []}
for k in range(B.K):
    cls = classify_bricks(params, poses[k + 1], PTS[k], NRM[k], cam, bs,
                          f32, m // bs[0], 0)
    flat = jnp.reshape(cls, (-1,))
    for c in counts:
        counts[c].append(int(jnp.sum(flat == c)))
print(f"fine: total {NB}  out {min(counts[0])}-{max(counts[0])} "
      f" free {min(counts[1])}-{max(counts[1])} "
      f" full {min(counts[2])}-{max(counts[2])}", flush=True)
