"""512^3 fuse-only optimization matrix on the TPU (VERDICT r1 item 1).

Round-2 breakdown (BENCHMARKS.md): fuse 103.8 ms = per-brick 66.8 (cap
49152, actual n_full max 36724 -> 1.34x oversized and cap-bound) + color
26.0 + classify 11.1. Hypothesis: the per-brick cost is dominated by the
pixel-row gather (cap*BV/(sk*sj) rows), so right-sizing the cap and
scaling pixel_share to the 512^3 voxel size (4x4 has the same METRIC
group radius as the accuracy-proven 2x2 at 256^3) should stack.

Sweeps fuse-only 10-frame on-device loops over (cap, share) and prints
ms/frame for each.
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
from tracking_sdf_tpu.fusion.brickmajor import fuse_frame_brickmajor

K = 10
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
vdt = jnp.bfloat16 if cfg.fusion.storage_dtype == "bfloat16" else None
bg0 = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
pose0 = poses[0]


def run(label, cap, cap_free, sk, sj, color=True):
    fcfg = cfg.fusion._replace(mode="bricked", pixel_share=sk,
                               pixel_share_j=sj)

    @jax.jit
    def fuse_k(bg, pose):
        def body(k, bg):
            bg2, _, _ = fuse_frame_brickmajor(
                bg, Pose(pose.R, pose.t + 1e-6 * k), PTS[k % B.K],
                NRM[k % B.K], rgb if color else None, params=params,
                cam=cam, cfg=fcfg, bs=(8, 8, 8), cap=cap,
                cap_free=cap_free, emit_dm="view")
            return bg2
        return jax.lax.fori_loop(0, K, body, bg)

    out = fuse_k(bg0, pose0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fuse_k(out, pose0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:42s} {best*1e3:8.2f} ms", flush=True)
    return best


if os.environ.get("FUSE_VARIANTS") == "preset":
    # single-variant mode for environment A/Bs (e.g. TSDF_FACTORED_SHARE=1)
    run(f"preset caps, share={cfg.fusion.pixel_share}x"
        f"{cfg.fusion.pixel_share_j}", cfg.fusion.brick_cap,
        cfg.fusion.brick_cap_free, cfg.fusion.pixel_share,
        cfg.fusion.pixel_share_j)
elif os.environ.get("FUSE_VARIANTS") == "occluded":
    # post-OCCLUDED-class cap trim (composition probe: ~22.5k of 36.7k FULL
    # bricks survive the eta bound; the conservative 4x4-window max query
    # keeps more — sweep down and watch the breakdown probe's n_full max)
    run("cap=38912 free=12288 share=4x4", 38912, 12288, 4, 4)
    run("cap=30720 free=12288 share=4x4", 30720, 12288, 4, 4)
    run("cap=26624 free=12288 share=4x4", 26624, 12288, 4, 4)
else:
    run("cap=49152 free=16384 share=2x2 (r1 preset)", 49152, 16384, 2, 2)
    run("cap=38912 free=12288 share=2x2", 38912, 12288, 2, 2)
    run("cap=38912 free=12288 share=4x2", 38912, 12288, 4, 2)
    run("cap=38912 free=12288 share=4x4", 38912, 12288, 4, 4)
    run("cap=38912 free=12288 share=4x4 -color", 38912, 12288, 4, 4,
        color=False)
    run("cap=38912 free=12288 share=8x4", 38912, 12288, 8, 4)
