"""512^3 fuse speed: share x factored_share x distance (round-3 item 1).

At share 4x4 the explicit per-voxel broadcast of the gathered rows
materializes ~640 MB of HLO per fuse; factored_share keeps the gather
output factored (size-1 share dims) and lets XLA fuse the broadcast into
the update/merge arithmetic. At 256^3/share 2x2 the explicit broadcast
measured FASTER (BENCHMARKS.md batch C); this sizes the flip at 512^3.
hier_classify=4 everywhere (the new preset default).
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
from tracking_sdf_tpu.fusion.brickmajor import (
    empty_brick_grid,
    fuse_frame_brickmajor,
)

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
fu = cfg.fusion
bs = fu.brick_shape
cap = fu.brick_cap
cap_free = fu.brick_cap_free or cap
f32 = jnp.float32
pose0 = poses[0]
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
    float(out.W.sum())
    best = float("inf")
    for rep in range(1, 4):
        bg = empty_brick_grid(params, bs, f32, vdt)
        t0 = time.perf_counter()
        out = run(bg, jnp.float32(rep * 1e-7))
        float(out.W.sum())
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:36s} {best*1e3:8.3f} ms", flush=True)
    return best


base = fu._replace(hier_classify=4, cap_mixed=1536)
if os.environ.get("COMPOSE") == "1":
    # round-3: composition of the shipped 42.4 ms (share 4x4 p2p preset)
    fuse_loop(base, "preset (share4x4 p2p color)")
    fuse_loop(base._replace(fuse_color=False), "color OFF")
    fuse_loop(base._replace(pixel_share=1, pixel_share_j=1),
              "share 1x1 (exact rows)")
    fuse_loop(base._replace(hier_classify=0), "hier OFF")
    globals()['cap_free'] = 4096
    fuse_loop(base, "cap_free 4096")
    raise SystemExit
for sk, sj in ((8, 4), (4, 4)):
    for factored in (False, True):
        c = base._replace(pixel_share=sk, pixel_share_j=sj,
                          factored_share=factored)
        fuse_loop(c, f"share {sk}x{sj} factored={int(factored)}")
# distance mode at the accuracy share
fuse_loop(base._replace(pixel_share=4, pixel_share_j=4, factored_share=True,
                        distance="point_to_point"),
          "share 4x4 factored=1 p2p")

if os.environ.get("EXTRA") == "1":
    # p2p without factored + cap trim at the accuracy share (at 8x4 cap
    # trimming measured FLAT; 4x4's per-brick cost is 2x — re-measure)
    fuse_loop(base._replace(pixel_share=4, pixel_share_j=4,
                            distance="point_to_point"),
              "share 4x4 factored=0 p2p")
    globals()['cap'] = 34816
    fuse_loop(base._replace(pixel_share=4, pixel_share_j=4),
              "share 4x4 cap=34816")
    fuse_loop(base._replace(pixel_share=4, pixel_share_j=4,
                            distance="point_to_point"),
              "share 4x4 cap=34816 p2p")
    globals()['cap'] = 30720
    fuse_loop(base._replace(pixel_share=4, pixel_share_j=4),
              "share 4x4 cap=30720")
