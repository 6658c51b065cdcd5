"""Net device-rate A/B of the saturated-FREE skip (sat_skip) on the TPU.

The microprobes (probe_512_split_final.py) predict a LOSS: FREE rows cost
~0 in the folded merge (cap_free 8192 -> 64 moved nothing) while the
bitset's two maintenance scatters cost 2.5-6 ms each standalone. This probe
measures the real fused cost: fuse_frame_brickmajor with a carried sat vs
without, same K-frame fori loop, preset caps — on a PRE-SATURATED grid
(max_weight reached) so the skip path is maximally engaged.

Run with BENCH_PRESET=tum256 / tum512.
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
from tracking_sdf_tpu.fusion.brickmajor import fuse_frame_brickmajor

K = 10
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
fcfg = cfg.fusion._replace(mode="bricked")
vdt = jnp.bfloat16 if fcfg.storage_dtype == "bfloat16" else None
if params.m >= 512:
    bg0 = B._bootstrap_brickmajor(cfg, cam, poses, rgb, vdt)
else:
    from tracking_sdf_tpu.fusion.brickmajor import brick_grid_from_dense
    bg0 = brick_grid_from_dense(B._bootstrap(cfg, cam, poses, rgb),
                                (8, 8, 8), value_dtype=vdt)
pose0 = poses[0]
NB = (params.m // 8) ** 3
cap, capf = fcfg.brick_cap, fcfg.brick_cap_free
print(f"# m={params.m} caps {cap}/{capf} mw={fcfg.max_weight}", flush=True)


def loop(with_sat, color):
    @jax.jit
    def run(bg, pose, sat):
        def body(k, carry):
            bg, sat = carry
            out = fuse_frame_brickmajor(
                bg, Pose(pose.R, pose.t + 1e-6 * k), PTS[k % B.K],
                NRM[k % B.K], rgb if color else None, params=params,
                cam=cam, cfg=fcfg, bs=(8, 8, 8), cap=cap, cap_free=capf,
                emit_dm=False, sat=(sat if with_sat else None))
            if with_sat:
                bg, _, _, sat = out
            else:
                bg, _, _ = out
            return bg, sat
        return jax.lax.fori_loop(0, K, body, (bg, sat))
    return run


# saturate: run mw+2 frames once (weights clamp at max_weight=128 would
# need 128 frames; instead warm with the sat path so detection state is
# realistic — FREE bricks here saturate only after mw frames, so ALSO
# measure with a low-mw config to see the fully-engaged skip)
for tag, mwv in (("preset-mw", fcfg.max_weight), ("mw=4 (fully engaged)", 4.0)):
    fcfg = cfg.fusion._replace(mode="bricked", max_weight=mwv)
    sat0 = jnp.zeros((NB,), bool)
    # warm the bitset: enough frames to saturate FREE bricks under mwv
    warm_rounds = 1 if mwv is None or mwv > 16 else (int(mwv) // K + 2)
    bg = jax.tree.map(jnp.copy, bg0)
    runs = loop(True, True)
    for _ in range(warm_rounds):
        bg, sat0 = runs(bg, pose0, sat0)
    n_sat = int(jnp.sum(sat0.astype(jnp.int32)))
    print(f"# {tag}: n_sat after warm = {n_sat}", flush=True)

    for color in (False, True):
        for with_sat in (False, True):
            fn = loop(with_sat, color)
            bgx = jax.tree.map(jnp.copy, bg)
            st = sat0
            bgx, st = fn(bgx, pose0, st)  # compile+warm
            _ = float(bgx.W.ravel()[0])
            best = float("inf")
            for _r in range(3):
                t0 = time.perf_counter()
                bgx, st = fn(bgx, pose0, st)
                _ = float(bgx.W.ravel()[0])
                best = min(best, (time.perf_counter() - t0) / K)
            lab = f"{tag} color={int(color)} sat={int(with_sat)}"
            print(f"{lab:44s} {best*1e3:8.2f} ms", flush=True)
