"""Renderer rays/s sweep (round 4, VERDICT r3 weak #7).

Tracking rays have a measured sweep (8.9-15 M/s); the RENDERER never did.
Measures raycast at 640x480 over a fused 256^3 (or BENCH_PRESET=tum512)
grid: stride 1/2/4 x {newton, march} fine modes + the exact trilinear
mode, reporting ms/render, Mrays/s, coverage vs the exact mode, and
drops. K renders per dispatch with k-perturbed poses (LICM rule), forced
value fetch, best of 3.
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
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.fusion.brickmajor import dense_from_brick_grid
from tracking_sdf_tpu.render.raycast import raycast

K = 5
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
vdt = jnp.bfloat16 if cfg.fusion.storage_dtype == "bfloat16" else None

# fuse a few frames so the render has a real model
bg = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
from tracking_sdf_tpu.fusion.brickmajor import fuse_frame_brickmajor

fcfg = cfg.fusion._replace(mode="bricked")
for k in range(3):
    # PTS[k]/NRM[k] are observed at poses[k + 1] (bench.build_inputs)
    bg, _, _ = fuse_frame_brickmajor(
        bg, poses[k + 1], PTS[k], NRM[k], rgb, params=params, cam=cam,
        cfg=fcfg, bs=(8, 8, 8), cap=fcfg.brick_cap,
        cap_free=fcfg.brick_cap_free or None, emit_dm=False)
grid = dense_from_brick_grid(bg, params, (8, 8, 8))
jax.block_until_ready(grid.D)
pose0 = poses[0]
print(f"# render sweep m={params.m}, {cam.width}x{cam.height}, K={K}",
      flush=True)

baseline_hits = {}


def run(label, rc_cfg, stride):
    n_rays = (cam.height // stride) * (cam.width // stride)

    @jax.jit
    def render_k(pose):
        def body(k, acc):
            p = Pose(pose.R, pose.t + 1e-6 * k)
            r = raycast(grid, p, params=params, cam=cam, cfg=rc_cfg,
                        stride=stride)
            return (acc[0] + jnp.nansum(r.depth), acc[1] + jnp.sum(r.hit),
                    acc[2] + r.dropped)
        return jax.lax.fori_loop(
            0, K, body, (jnp.float32(0.0), jnp.int32(0), jnp.int32(0)))

    try:
        t0 = time.time()
        out = render_k(pose0)
        _ = float(out[0])
        compile_s = time.time() - t0
        best = float("inf")
        for rep in (1, 2, 3):
            p = Pose(pose0.R, pose0.t + jnp.float32(rep * 1e-7))
            t0 = time.perf_counter()
            out = render_k(p)
            _ = float(out[0])
            best = min(best, (time.perf_counter() - t0) / K)
        hits = int(out[1]) // K
        drops = int(out[2]) // K
        key = stride
        if label.startswith("trilinear"):
            baseline_hits[key] = hits
        cov = (100.0 * hits / baseline_hits[key]
               if baseline_hits.get(key) else float("nan"))
        print(f"{label:22s} stride {stride}: {best*1e3:8.1f} ms/render  "
              f"{n_rays/best/1e6:6.2f} Mrays/s  hits {hits} "
              f"({cov:.1f}% of exact)  drops {drops} "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{label:22s} stride {stride}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


VARIANTS = os.environ.get("RENDER_VARIANTS", "r4")
for stride in (4, 2, 1):
    if VARIANTS == "far":  # round-5 far-field chamfer A/B (VERDICT item 3)
        run("trilinear-exact", RaycastConfig(sample="trilinear"), stride)
        run("nearest+newton", RaycastConfig(), stride)
        run("nn+far-chamfer", RaycastConfig(far_field="chamfer"), stride)
    elif VARIANTS == "unroll":  # round-5 march_unroll A/B (bitwise-equal)
        run("nearest+newton U=1", RaycastConfig(), stride)
        run("nearest+newton U=4", RaycastConfig(march_unroll=4), stride)
        run("nearest+newton U=8", RaycastConfig(march_unroll=8), stride)
    else:
        run("trilinear-exact", RaycastConfig(sample="trilinear"), stride)
        run("nearest+newton", RaycastConfig(), stride)
        run("nearest+march", RaycastConfig(fine_mode="march"), stride)
print("# done", flush=True)
