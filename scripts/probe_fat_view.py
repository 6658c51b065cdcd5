"""Fat-row tracking view A/B: kill the per-frame Dm tile-relayout?

brick_masked_view reshapes (NB, BV) -> (-1, 128) for the corner fetch —
logically row-major-preserving, physically a TPU tile-relayout COPY
(~5.3 ms/frame at 512^3, ~1.6 at 256^3). A FAT view gathers width-BV rows
directly (zero relayout); gather cost is per-row, but the iota lane-select
runs over BV lanes instead of 128. This measures the full per-frame
tradeoff at the bench configuration: relayout + N GN iters (128-view) vs
N GN iters (fat view), K frames per dispatch, value-fetch timing.

BENCH_PRESET=tum256|tum512.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.grid.interp import BrickMaskedView
from tracking_sdf_tpu.tracking.gauss_newton import track_frame

K = 10
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params, tcfg = cfg.grid, cfg.tracking
vdt = jnp.bfloat16 if cfg.fusion.storage_dtype == "bfloat16" else None
if params.m >= 512:
    bg = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
else:
    from tracking_sdf_tpu.fusion.brickmajor import brick_grid_from_dense
    bg = brick_grid_from_dense(B._bootstrap(cfg, cam, poses, rgb),
                               (8, 8, 8), value_dtype=vdt)
pose0 = poses[0]
BS = (8, 8, 8)
print(f"# m={params.m} BV=512 stride={tcfg.pixel_stride}", flush=True)


def run(label, fat, n_iters):
    t = tcfg._replace(max_iterations=n_iters, max_twist_diff=0.0)

    @jax.jit
    def frames(D_rows, pose):
        def body(k, p):
            # per-frame: (re)build the view from the raw fat rows — the
            # 128-view pays the relayout HERE, inside the frame, exactly
            # as emit_dm="view" does; the fat view is a zero-op wrap
            # k-dep guard (LICM trap): one-element perturbation makes the
            # whole array loop-dependent without an elementwise pass
            Dk = D_rows.at[0, 0].add(
                jnp.asarray(k, D_rows.dtype) * jnp.asarray(1e-6,
                                                           D_rows.dtype))
            rows = Dk if fat else Dk.reshape(-1, 128)
            Dm = BrickMaskedView(rows, params.m, BS)
            res = track_frame(None, Pose(p.R, p.t + 1e-6 * k),
                              PTS_S[k % B.K], params=params, cfg=t, Dm=Dm)
            return res.pose
        return jax.lax.fori_loop(0, K, body, pose)

    p = frames(bg.D, pose0)
    _ = float(p.t[0])
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        p = frames(bg.D, p)
        _ = float(p.t[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:40s} {best*1e3:8.2f} ms/frame", flush=True)
    return best


for n in (2, 4):
    a = run(f"view-128 (relayout + {n} GN iters)", False, n)
    b = run(f"fat-view (zero relayout + {n} GN iters)", True, n)
    print(f"#   delta at {n} iters: {(a-b)*1e3:+.2f} ms", flush=True)
