"""What are the 36.7k FULL bricks at 512^3 actually doing?

Counts, per frame on the bench trajectory: FULL bricks whose update is
all-zero (every voxel masked out — e.g. provably-occluded bricks behind
surfaces, or NaN shadows) and FULL bricks with tiny coverage. A large
zero-update fraction justifies a 4th OCCLUDED brick class (max-mip bound:
pz_min beyond every candidate surface's far band edge -> skip entirely),
which would cut per-brick work, gathers, and merge rows proportionally.

Also times classify_bricks alone (sizing the hierarchical-classify win)
and a brick-shape A/B (16,8,8) vs (8,8,8): bigger bricks cut classify and
zeta-query counts 2x for ~15% more per-voxel padding waste.
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
    _full_brick_updates, _pixel_table, classify_bricks)
from tracking_sdf_tpu.fusion.brickmajor import fuse_frame_brickmajor

K = 10
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, fcfg = cfg.grid, cfg.fusion._replace(mode="bricked")
vdt = jnp.bfloat16 if fcfg.storage_dtype == "bfloat16" else None
pose0 = poses[0]
m = params.m


def composition(bs, cap):
    nb3 = (m // bs[0], m // bs[1], m // bs[2])

    @jax.jit
    def one(k):
        pose = Pose(pose0.R, pose0.t + 1e-6 * k)
        pix = _pixel_table(PTS[k], NRM[k], rgb, True, jnp.float32,
                           fcfg.distance)
        bc = classify_bricks(params, pose, PTS[k], NRM[k], cam, bs,
                             jnp.float32, nb3[0], 0, fcfg.distance)
        upd, full_ids, valid, n_full, _ = _full_brick_updates(
            bc, pix, pose, params, cam, fcfg, bs, cap, jnp.float32,
            nb3, 0, PTS[k].shape[:2], True)
        w = upd[0].reshape(cap, -1)
        per_brick = jnp.sum(w > 0, axis=1)  # voxels updated per FULL brick
        zero = jnp.sum((per_brick == 0) & valid)
        tiny = jnp.sum((per_brick > 0) & (per_brick < w.shape[1] // 8) & valid)
        return n_full, zero, tiny, jnp.sum(per_brick) / jnp.maximum(
            jnp.sum(valid), 1)

    for k in (0, 5, 9):
        n_full, zero, tiny, meanv = (int(x) if i < 3 else float(x)
                                     for i, x in enumerate(one(k)))
        bv = bs[0] * bs[1] * bs[2]
        print(f"bs={bs} frame {k}: n_full {n_full}, zero-update "
              f"{zero} ({100*zero/max(n_full,1):.0f}%), <1/8-coverage {tiny} "
              f"({100*tiny/max(n_full,1):.0f}%), mean voxels/brick "
              f"{meanv:.0f}/{bv}", flush=True)


composition((8, 8, 8), fcfg.brick_cap)
composition((16, 8, 8), fcfg.brick_cap // 2 + 4096)

# ---- classify-only timing --------------------------------------------------
for bs, nbi in (((8, 8, 8), m // 8), ((16, 8, 8), m // 16)):
    @jax.jit
    def cls_k(pose):
        def body(k, acc):
            bc = classify_bricks(params, Pose(pose.R, pose.t + 1e-6 * k),
                                 PTS[k % B.K], NRM[k % B.K], cam, bs,
                                 jnp.float32, m // bs[0], 0, fcfg.distance)
            return acc + jnp.sum(bc == 2)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    jax.block_until_ready(cls_k(pose0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(cls_k(pose0))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"classify-only bs={bs}: {best*1e3:.2f} ms", flush=True)

# ---- full fuse at (16,8,8) -------------------------------------------------
from tracking_sdf_tpu.fusion.brickmajor import empty_brick_grid

for bs, capx in (((16, 8, 8), 24576),):
    bgx = empty_brick_grid(params, bs, value_dtype=vdt)
    bgx, _, _ = fuse_frame_brickmajor(
        bgx, poses[0], PTS[0], NRM[0], rgb, params=params, cam=cam,
        cfg=fcfg, bs=bs, cap=capx, cap_free=8192, emit_dm=False)

    @jax.jit
    def fuse_k(bg, pose):
        def body(k, bg):
            bg2, _, _ = fuse_frame_brickmajor(
                bg, Pose(pose.R, pose.t + 1e-6 * k), PTS[k % B.K],
                NRM[k % B.K], rgb, params=params, cam=cam, cfg=fcfg,
                bs=bs, cap=capx, cap_free=8192, emit_dm="view")
            return bg2
        return jax.lax.fori_loop(0, K, body, bg)

    out = fuse_k(bgx, pose0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fuse_k(out, pose0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"fuse bs={bs} cap={capx}: {best*1e3:.2f} ms", flush=True)
