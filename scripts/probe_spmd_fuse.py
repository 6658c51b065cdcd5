"""1-device-mesh SPMD fuse cost vs local fuse (VERDICT r2 weak-item 4).

Round 2 measured the sharded brickmajor fuse at ~700 ms/frame on a
1-device mesh at 256^3 — the emit_dm=True slab relayout + halo stitch.
Round 3's zero-relayout path (emit_dm=False + brick-view tracking)
should collapse that to ~local fuse + shard_map overhead. K-loop
best-of-3, k-varied pose, one value fetch.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

import bench as B
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.fusion.brickmajor import (
    empty_brick_grid,
    fuse_frame_brickmajor,
)
from tracking_sdf_tpu.parallel import (
    make_mesh,
    shard_brick_grid,
    sharded_fuse_frame_brickmajor,
)

cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, fu = cfg.grid, cfg.fusion
bs = (8, 8, 8)
cap, cap_free = fu.brick_cap, fu.brick_cap_free or fu.brick_cap
vdt = jnp.bfloat16 if fu.storage_dtype == "bfloat16" else jnp.float32
pose0 = poses[0]
K = 10


def bench_loop(step, init, label):
    @jax.jit
    def run(bg, eps):
        def f(k, bg):
            return step(bg, Pose(pose0.R, pose0.t + 1e-7 * k + eps), k)
        return jax.lax.fori_loop(0, K, f, bg)

    out = run(init(), jnp.float32(0.0))
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for rep in range(1, 4):
        t0 = time.perf_counter()
        out = run(init(), jnp.float32(rep * 1e-7))
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:40s} {best*1e3:8.2f} ms/frame", flush=True)
    return best


def local_step(bg, p, k):
    bg, _, _ = fuse_frame_brickmajor(
        bg, p, PTS[k % B.K], NRM[k % B.K], rgb, params=params, cam=cam,
        cfg=fu, bs=bs, cap=cap, cap_free=cap_free, emit_dm=False)
    return bg


t_local = bench_loop(
    local_step, lambda: empty_brick_grid(params, bs, jnp.float32, vdt),
    "local fuse (emit_dm=False)")

mesh = make_mesh(jax.devices()[:1])
for emit in (False, True):
    fuse_sh = sharded_fuse_frame_brickmajor(
        mesh, params=params, cam=cam, cfg=fu, bs=bs, cap=cap,
        cap_free=cap_free, emit_dm=emit)

    def sh_step(bg, p, k, fuse_sh=fuse_sh):
        bg, _, _ = fuse_sh(bg, p, PTS[k % B.K], NRM[k % B.K], rgb)
        return bg

    t = bench_loop(
        sh_step,
        lambda: shard_brick_grid(
            empty_brick_grid(params, bs, jnp.float32, vdt), mesh),
        f"sharded 1-dev mesh (emit_dm={emit})")
    print(f"  ratio vs local: {t / t_local:.2f}x", flush=True)
