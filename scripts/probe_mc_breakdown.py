"""Where do marching-cubes' 2-3.3 s at 256^3 go? (round-1 measurement)

Stage timings for render/marching_cubes.py on the TPU: pass-1 active-cell
mask (device), mask device->host transfer (suspect: 16 MB bool over the
tunnel), host argwhere, pass-2 triangulation (device), triangle-buffer
device->host transfer (suspect: cap*6*2*9*4 B = ~100 MB at cap 256k),
host compaction, color interpolation. The reference meshes at 1 Hz on a
concurrent thread (sdf_reconstruction.cpp:97); knowing the split decides
whether device-side compaction is the fix.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.render.marching_cubes import (
    _active_cells, _triangulate_cells, marching_cubes)


def t(label, fn, reps=3):
    """fn takes a rep index: vary inputs per rep — the remote backend
    dedupes identical (program, args) re-dispatches (measured: impossible
    sub-RTT times on repeat calls)."""
    fn(0)  # warm/compile
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1e3:9.1f} ms", flush=True)
    return out


def main():
    cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
    grid = B._bootstrap(cfg, cam, poses, rgb)
    params = cfg.grid

    grids = [grid._replace(D=grid.D + jnp.float32(1e-7 * r))
             for r in range(4)]
    jax.block_until_ready(grids[-1].D)
    def _p1(r):  # value fetch: block_until_ready no-ops through the tunnel
        out = _active_cells(grids[r], params=params)
        float(out.ravel()[0].astype(jnp.float32))
        return out
    act = t("pass1 active_cells (device, +1 scalar fetch)", _p1)
    acts = [_active_cells(g, params=params) for g in grids]
    jax.block_until_ready(acts)
    mask = t("mask device->host (np.asarray)", lambda r: np.asarray(acts[r]))
    idx = t("host argwhere", lambda r: np.argwhere(mask).astype(np.int32))
    print(f"  active cells: {idx.shape[0]}")

    cap = 1 << max(10, int(np.ceil(np.log2(idx.shape[0]))))
    pad = np.concatenate([idx, np.zeros((cap - idx.shape[0], 3), np.int32)])
    jidx = jnp.asarray(pad)

    def _p2(r):
        out = _triangulate_cells(grids[r], jidx, params=params)
        float(out[0].ravel()[0])
        return out
    vv = t(f"pass2 triangulate (device, cap={cap}, +1 scalar fetch)", _p2)
    vvs = [_triangulate_cells(g, jidx, params=params) for g in grids]
    jax.block_until_ready(vvs)
    t("verts+valid device->host",
      lambda r: (np.asarray(vvs[r][0]), np.asarray(vvs[r][1])))
    verts, valid = vv
    v_np = np.asarray(verts).reshape(cap, 6, 2, 3, 3)
    m_np = np.array(valid).reshape(cap, 6, 2)
    m_np[idx.shape[0]:] = False
    t("host boolean compaction", lambda r: v_np[m_np])

    t("full marching_cubes grey",
      lambda r: marching_cubes(grids[r], params=params))
    mesh = t("full marching_cubes color",
             lambda r: marching_cubes(grids[r], params=params,
                                      with_colors=True))
    print(f"  triangles: {mesh.num_triangles}, dropped {mesh.dropped_cells}")


if __name__ == "__main__":
    main()
