"""Mesh transfer A/B: u16-quantized vertices vs f32 (VERDICT r4 item 7).

The tunnel moves 13-30 MB/s; a 256^3 color mesh is ~300k tris = ~11 MB of
f32 vertices (+ u8 colors since round 2). vertex_quant halves the vertex
bytes (u16 bbox coords, error <= extent/131070). Times marching_cubes with
and without quantization on a multi-frame fused grid (the transfer is the
dominant term — round-2 MC breakdown), best of 3.
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
from tracking_sdf_tpu.fusion.brickmajor import (
    dense_from_brick_grid, fuse_frame_brickmajor)
from tracking_sdf_tpu.render.marching_cubes import marching_cubes

cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
vdt = jnp.bfloat16 if cfg.fusion.storage_dtype == "bfloat16" else None
bg = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
fcfg = cfg.fusion._replace(mode="bricked")
for k in range(5):
    bg, _, _ = fuse_frame_brickmajor(
        bg, poses[k + 1], PTS[k], NRM[k], rgb, params=params, cam=cam,
        cfg=fcfg, bs=(8, 8, 8), cap=fcfg.brick_cap,
        cap_free=fcfg.brick_cap_free or None, emit_dm=False)
grid = dense_from_brick_grid(bg, params, (8, 8, 8))
jax.block_until_ready(grid.D)

for colors in (False, True):
    for quant in (False, True):
        best = float("inf")
        n_tri = 0
        for _ in range(3):
            t0 = time.perf_counter()
            mesh = marching_cubes(grid, params=params, with_colors=colors,
                                  vertex_quant=quant)
            best = min(best, time.perf_counter() - t0)
            n_tri = mesh.num_triangles
        mb = n_tri * 3 * 3 * (2 if quant else 4) / 1e6
        print(f"colors={int(colors)} quant={int(quant)}: {best*1e3:8.1f} ms "
              f"({n_tri} tris, vertex payload {mb:.1f} MB)", flush=True)
