"""TPU A/B: raycast 640x480 off a fused 256^3 grid, empty_skip on/off.

Measures the empty-space-skipping leap (render/raycast.py _skip_mip
chamfer, commit 9070043) on the real chip. K renders in ONE on-device
fori_loop dispatch, k-dependent pose (LICM-proofed), a full-image nansum
forcing the march each iteration — the earlier per-dispatch version
measured 0.1 ms/render for skip OFF (async dispatch artifact), which is
not a number a 307k-ray march can produce.
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
from tracking_sdf_tpu.core.lie import Pose
from tracking_sdf_tpu.render.raycast import raycast, RaycastConfig

K = 5


def main():
    cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
    grid = B._bootstrap(cfg, cam, poses, rgb)
    params = cfg.grid
    pose0 = poses[0]

    for label, rcfg in [
        ("trilinear", RaycastConfig(sample="trilinear")),
        ("nearest t_fine=3", RaycastConfig(sample="nearest_far")),
        ("nearest t_fine=2", RaycastConfig(sample="nearest_far",
                                           fine_threshold=2.0)),
        ("nearest t_fine=1.5", RaycastConfig(sample="nearest_far",
                                             fine_threshold=1.5)),
        ("nearest t1.5 f20", RaycastConfig(sample="nearest_far",
                                           fine_threshold=1.5,
                                           fine_steps=20)),
    ]:
        @jax.jit
        def run_k(g, pose, rc=rcfg):
            def body(k, acc):
                p = Pose(pose.R, pose.t + 1e-6 * k)
                out = raycast(g, p, params=params, cam=cam, cfg=rc)
                return acc + jnp.nansum(out.depth)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        # vary inputs across reps AND force a VALUE FETCH per rep:
        # block_until_ready does not reliably synchronize through the
        # tunnel (measured 0.0 ms for a 307k-ray march) — only fetching
        # bytes does (CLAUDE.md: "force one value fetch at the end")
        float(run_k(grid, pose0))
        best = float("inf")
        for rep in range(1, 4):
            p_rep = Pose(pose0.R, pose0.t + 1e-5 * rep)
            t0 = time.perf_counter()
            float(run_k(grid, p_rep))
            best = min(best, (time.perf_counter() - t0) / K)
        out = raycast(grid, pose0, params=params, cam=cam, cfg=rcfg)
        hits = int(jnp.sum(jnp.asarray(out.hit)))
        print(f"raycast {label:10s} {best*1e3:8.1f} ms/render  "
              f"({hits} hit px)", flush=True)


if __name__ == "__main__":
    main()
