"""TPU A/B: raycast 640x480 off a fused 256^3 grid, empty_skip on/off.

Measures the committed-but-unmeasured empty-space-skipping leap
(render/raycast.py _skip_mip chamfer, commit 9070043) on the real chip.
K renders per on-device dispatch (lax.fori-style scan via jax.lax.map is
overkill here: raycast is one big jit; we time K sequential dispatches of
the SAME compiled fn and subtract nothing — per-dispatch tunnel jitter is
amortized by best-of-3 over K=5 batches).
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
from tracking_sdf_tpu.render.raycast import raycast, RaycastConfig


def main():
    cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
    grid = B._bootstrap(cfg, cam, poses, rgb)
    params = cfg.grid

    for label, rcfg in [
        ("skip OFF", RaycastConfig(empty_skip=False)),
        ("skip ON", RaycastConfig(empty_skip=True)),
    ]:
        fn = jax.jit(lambda g, p, rc=rcfg: raycast(
            g, p, params=params, cam=cam, cfg=rc))
        out = fn(grid, poses[0])  # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for k in range(5):
                out = fn(grid, poses[k % len(poses)])
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 5)
        d = out.depth if hasattr(out, "depth") else out[0]
        hits = int(jnp.sum(jnp.isfinite(jnp.asarray(d))))
        print(f"raycast {label:10s} {best*1e3:8.1f} ms/render  "
              f"({hits} hit px)", flush=True)


if __name__ == "__main__":
    main()
