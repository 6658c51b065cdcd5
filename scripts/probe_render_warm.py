"""Temporal warm-start renderer A/B (round 4): sequential 640x480 renders
over a fused 256^3 grid, each warm-started from the previous frame's
range image, vs cold renders of the same pose chain. K renders per
dispatch, forced value fetch, best of 3; also reports hit-count parity.
"""
import os
import sys
import time

os.environ.setdefault("BENCH_PRESET", "tum256")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.config import RaycastConfig
from tracking_sdf_tpu.core.lie import Pose, pose_compose, se3_exp
from tracking_sdf_tpu.fusion.brickmajor import (
    dense_from_brick_grid, fuse_frame_brickmajor)
from tracking_sdf_tpu.render.raycast import raycast

K = 5
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
vdt = jnp.bfloat16 if cfg.fusion.storage_dtype == "bfloat16" else None
bg = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
fcfg = cfg.fusion._replace(mode="bricked")
for k in range(3):
    # PTS[k]/NRM[k] are observed at poses[k + 1] (bench.build_inputs)
    bg, _, _ = fuse_frame_brickmajor(
        bg, poses[k + 1], PTS[k], NRM[k], rgb, params=params, cam=cam,
        cfg=fcfg, bs=(8, 8, 8), cap=fcfg.brick_cap,
        cap_free=fcfg.brick_cap_free or None, emit_dm=False)
grid = dense_from_brick_grid(bg, params, (8, 8, 8))
jax.block_until_ready(grid.D)
rc = RaycastConfig()
pose0 = poses[0]
# inter-render motion ~ the bench trajectory's handheld step
XI = jnp.asarray([0.008, -0.004, 0.007, 0.007, -0.005, 0.006], jnp.float32)


def chain(warm: bool, stride: int = 1):
    @jax.jit
    def render_k(pose_R, pose_t, eps):
        def body(k, carry):
            R, t, prev, acc, hits = carry
            pose = Pose(R, t + eps * k)
            r = raycast(grid, pose, params=params, cam=cam, cfg=rc,
                        stride=stride, t_init=prev if warm else None)
            nxt = pose_compose(pose, se3_exp(XI))
            return (nxt.R, nxt.t, r.range_t,
                    acc + jnp.nansum(r.depth), hits + jnp.sum(r.hit))
        prev0 = jnp.full((cam.height // stride, cam.width // stride),
                         jnp.nan, jnp.float32)
        out = jax.lax.fori_loop(
            0, K, body, (pose_R, pose_t, prev0, jnp.float32(0.0),
                         jnp.int32(0)))
        return out[3], out[4]

    t0 = time.time()
    out = render_k(pose0.R, pose0.t, jnp.float32(0.0))
    _ = float(out[0])
    compile_s = time.time() - t0
    best = float("inf")
    for rep in (1, 2, 3):
        t0 = time.perf_counter()
        out = render_k(pose0.R, pose0.t, jnp.float32(rep * 1e-7))
        _ = float(out[0])
        best = min(best, (time.perf_counter() - t0) / K)
    label = ("warm" if warm else "cold") + f" s{stride}"
    print(f"{label:12s} {best*1e3:8.1f} ms/render  hits/frame "
          f"{int(out[1]) // K}  (compile {compile_s:.0f}s)", flush=True)
    return int(out[1]) // K


print(f"# warm-start render chain, m={params.m}, {cam.width}x{cam.height}, "
      f"K={K}", flush=True)
h_cold = chain(False)
h_warm = chain(True)
print(f"# hit parity: warm/cold = {h_warm / max(h_cold, 1):.4f}", flush=True)
# serving-preview rows (round 5): warm start x march_unroll at strides
if os.environ.get("WARM_STRIDES", "1") == "1":
    for st in (2, 4):
        chain(False, st)
        chain(True, st)
