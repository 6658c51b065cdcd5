"""Raycast fine-phase tuning (VERDICT r3 item 9).

The nearest_far pipeline is: cheap 1-row/far march -> FULL-BATCH
trilinear finish (fine_steps x 8 row-gathers for ALL N rays — masked
rays still gather) -> compacted N/16 grazing recovery. ~3% grazing rays
keep the full-batch finish alive for all 12 steps, so most of its
12 x 8 x N gathers serve nobody. Cutting fine_steps pushes stragglers
into the COMPACTED recovery phase (16x smaller batch), trading
full-batch steps for compacted steps.

Sweeps fine_steps, reporting render ms (best-of-3, k-varied pose),
hit count vs the exact trilinear mode, and recovery drops.
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
from tracking_sdf_tpu.config import RaycastConfig
from tracking_sdf_tpu.core.camera import ros_default_camera
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.render.raycast import raycast

cfg, cam_b, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
cam = ros_default_camera()

# build a fused grid like the bench render path
from tracking_sdf_tpu.fusion.brickmajor import (
    dense_from_brick_grid,
    empty_brick_grid,
    fuse_frame_brickmajor,
)

fu = cfg.fusion
bs = fu.brick_shape
vdt = jnp.bfloat16 if fu.storage_dtype == "bfloat16" else jnp.float32
bg = empty_brick_grid(cfg.grid, bs, jnp.float32, vdt)
for k in range(B.K):
    bg, _, _ = fuse_frame_brickmajor(
        bg, poses[k], PTS[k], NRM[k], rgb[k], params=cfg.grid, cam=cam_b,
        cfg=fu, bs=bs, cap=fu.brick_cap, cap_free=fu.brick_cap_free or None,
        emit_dm=False)
grid = dense_from_brick_grid(bg, cfg.grid, bs)
pose = poses[0]


def measure(rc, label, ref_hits=None):
    def once(eps):
        p = Pose(pose.R, pose.t + eps)
        r = raycast(grid, p, params=cfg.grid, cam=cam, cfg=rc)
        return (jnp.sum(r.hit.astype(jnp.int32)), r.dropped)

    h, d = jax.jit(once)(jnp.float32(0.0))
    hits, drop = int(h), int(d)
    best = float("inf")
    for rep in range(1, 4):
        t0 = time.perf_counter()
        h, d = jax.jit(once)(jnp.float32(rep * 1e-7))
        int(h)
        best = min(best, time.perf_counter() - t0)
    cov = "" if ref_hits is None else f"  cov {100.0*hits/ref_hits:6.2f}%"
    print(f"{label:28s} {best*1e3:7.1f} ms  hits {hits}{cov}  dropped {drop}",
          flush=True)
    return hits


ref = measure(RaycastConfig(sample="trilinear"), "trilinear (exact)")
if os.environ.get("NEWTON") == "1":
    for fs in (12, 9, 6):
        measure(RaycastConfig(fine_mode="newton", fine_steps=fs),
                f"nearest_far newton n={max(2, fs // 3)}", ref)
else:
    for fs in (12, 8, 6, 4):
        measure(RaycastConfig(fine_steps=fs), f"nearest_far fine={fs}", ref)
