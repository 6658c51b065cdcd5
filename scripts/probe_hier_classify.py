"""A/B: hierarchical vs flat classify+compact at 512^3 (VERDICT r2 item 4).

Measures the REAL kernels end to end:
  flat : classify_bricks + _compact_ids(full) + _compact_ids(free)
  hier : classify_compact_hier (super classify -> mixed descent -> compact)
plus the full fuse_frame_brickmajor A/B (the number that matters), with
k-varied poses, one-dispatch loops and value fetches (CLAUDE.md probe
rules). Run with BENCH_PRESET=tum512 (default) or tum256.
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
    _compact_ids,
    classify_bricks,
    classify_compact_hier,
)

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
fu = cfg.fusion
bs = fu.brick_shape
m = params.m
NB = (m // bs[0]) * (m // bs[1]) * (m // bs[2])
cap = fu.brick_cap
cap_free = fu.brick_cap_free or cap
f32 = jnp.float32
pose0 = poses[0]
FACTOR = int(os.environ.get("HIER_FACTOR", "4"))
CAP_MIXED = int(os.environ.get("CAP_MIXED", "1536"))


def timeit(label, body):
    @jax.jit
    def run(eps):
        def f(k, acc):
            return acc + body(k, eps)
        return jax.lax.fori_loop(0, K, f, jnp.float32(0.0))

    float(run(jnp.float32(0.0)))
    best = float("inf")
    for rep in range(1, 4):
        t0 = time.perf_counter()
        float(run(jnp.float32(rep * 1e-7)))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:34s} {best*1e3:8.3f} ms", flush=True)
    return best


def pose_k(k, eps):
    return Pose(pose0.R, pose0.t + (1e-7 * k + eps))


def body_flat(k, eps):
    cls = classify_bricks(params, pose_k(k, eps), PTS[k % B.K], NRM[k % B.K],
                          cam, bs, f32, m // bs[0], 0,
                          fu.distance).reshape(-1)
    full_ids = _compact_ids(cls == 2, cap, NB)
    fr_ids = _compact_ids(cls == 1, cap_free, NB)
    return (full_ids[0] + full_ids[-1] + fr_ids[0] + fr_ids[-1]
            ).astype(jnp.float32)


def body_hier(k, eps):
    full_ids, fr_ids, n_full, n_free, om, of = classify_compact_hier(
        params, pose_k(k, eps), PTS[k % B.K], NRM[k % B.K], cam, bs, f32,
        m // bs[0], 0, fu.distance, cap, cap_free, FACTOR, CAP_MIXED)
    return (full_ids[0] + full_ids[-1] + fr_ids[0] + fr_ids[-1]
            ).astype(jnp.float32)


# equivalence: same id SETS on the real frames
import numpy as np
for k in range(3):
    cls = np.asarray(classify_bricks(params, poses[k + 1], PTS[k], NRM[k],
                                     cam, bs, f32, m // bs[0], 0,
                                     fu.distance)).reshape(-1)
    fi, fr, nf, nfr, om, of = classify_compact_hier(
        params, poses[k + 1], PTS[k], NRM[k], cam, bs, f32, m // bs[0], 0,
        fu.distance, cap, cap_free, FACTOR, CAP_MIXED)
    fi, fr = np.asarray(fi), np.asarray(fr)
    want_full = set(np.flatnonzero(cls == 2).tolist())
    want_free = set(np.flatnonzero(cls == 1).tolist())
    got_full = set(fi[fi < NB].tolist())
    got_free = set(fr[fr < NB].tolist())
    assert got_full == want_full, (len(got_full), len(want_full))
    assert got_free == want_free, (len(got_free), len(want_free))
    assert int(om) == 0 and int(of) == 0
    print(f"frame {k}: n_full {int(nf)} n_free {int(nfr)} equal-sets ok",
          flush=True)

timeit("flat classify+compact", body_flat)
timeit(f"hier f={FACTOR} cap_mixed={CAP_MIXED}", body_hier)

# ---- full fuse A/B ---------------------------------------------------------
from tracking_sdf_tpu.fusion.brickmajor import (
    empty_brick_grid,
    fuse_frame_brickmajor,
)

vdt = jnp.bfloat16 if fu.storage_dtype == "bfloat16" else f32


def fuse_loop(cfg_ab, label):
    @jax.jit
    def run(bg, eps):
        def f(k, bg):
            bg, _, _ = fuse_frame_brickmajor(
                bg, Pose(pose0.R, pose0.t + 1e-7 * k + eps),
                PTS[k % B.K], NRM[k % B.K], rgb[k % B.K],
                params=params, cam=cam, cfg=cfg_ab, bs=bs, cap=cap,
                cap_free=cap_free, emit_dm=False)
            return bg
        return jax.lax.fori_loop(0, K, f, bg)

    bg = empty_brick_grid(params, bs, f32, vdt)
    out = run(bg, jnp.float32(0.0))
    float(out.W.sum())  # warm + fetch
    best = float("inf")
    for rep in range(1, 4):
        bg = empty_brick_grid(params, bs, f32, vdt)
        t0 = time.perf_counter()
        out = run(bg, jnp.float32(rep * 1e-7))
        float(out.W.sum())
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:34s} {best*1e3:8.3f} ms", flush=True)
    return best


fuse_loop(fu, "fuse flat (preset)")
fuse_loop(fu._replace(hier_classify=FACTOR, cap_mixed=CAP_MIXED),
          f"fuse hier f={FACTOR}")
