"""TPU timing: marching-cubes mesh extraction off a fused 256^3 grid.

First TPU measurement of render/marching_cubes.py (the 1 Hz meshing path,
sdf.cpp:317-391 equivalent) including the 2c18e3e row-gather corner fetch.
Reports end-to-end wall (device passes + host compaction) and the device
triangulation alone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.render.marching_cubes import (
    marching_cubes, marching_cubes_chunked)


def main():
    cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
    if cfg.grid.m >= 512:  # dense bootstrap OOMs HBM at 512^3 (bench.py)
        from tracking_sdf_tpu.fusion.brickmajor import dense_from_brick_grid

        vdt = (jnp.bfloat16
               if cfg.fusion.storage_dtype == "bfloat16" else None)
        bg = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
        grid = dense_from_brick_grid(bg, cfg.grid, (8, 8, 8))
        jax.block_until_ready(grid.D)
        del bg  # free the brick copy: dense f32 (3.2 GB) + brick bf16
        # (2.2 GB) + MC buffers together exhaust HBM at 512^3
    else:
        grid = B._bootstrap(cfg, cam, poses, rgb)

    mc = (marching_cubes_chunked if cfg.grid.m >= 512 else marching_cubes)
    for label, kw in [("grey", {}), ("color", {"with_colors": True})]:
        mesh = mc(grid, params=cfg.grid, **kw)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mesh = mc(grid, params=cfg.grid, **kw)
            best = min(best, time.perf_counter() - t0)
        print(f"marching_cubes {label:6s} {best*1e3:8.1f} ms  "
              f"({mesh.num_triangles} tris, dropped={mesh.dropped_cells})",
              flush=True)


if __name__ == "__main__":
    main()
