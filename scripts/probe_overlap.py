"""Device-contention cost of the concurrent mesh publisher (VERDICT r2
item 2, measured the driver-visible way).

The host-side per-frame runner measures ~4 fps through the tunnel
(dispatch-bound), which masks the real question: how much device time
does a concurrent mesh pass steal from the 72.9 fps on-device frame
loop? This probe runs the bench's warmed K-frame loop repeatedly in the
main thread while a second thread marching-cubes a grid snapshot in a
loop (continuous = WORST-case contention; a 1 Hz publisher costs the
measured fraction scaled by its duty cycle).

Reports: solo rep time, contended rep time, mesh pass wall time, and
the implied throughput cost of a 1 Hz / auto-degraded publisher.
"""
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

import bench as B
from tracking_sdf_tpu.fusion.brickmajor import (
    brick_grid_from_dense,
    brick_masked_view,
    dense_from_brick_grid,
)
from tracking_sdf_tpu.render.marching_cubes import marching_cubes

cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
vdt = jnp.bfloat16 if cfg.fusion.storage_dtype == "bfloat16" else None
dense0 = B._bootstrap(cfg, cam, poses, rgb)
bg0 = brick_grid_from_dense(dense0, (8, 8, 8), value_dtype=vdt)
state0 = (bg0, brick_masked_view(bg0, cfg.grid, (8, 8, 8)))
frame = B._frame_fn_brickmajor(cfg, cam)
K = B.K


@jax.jit
def run_k(state, pose_prev2, pose_prev, eps):
    def body(k, carry):
        state, p2, p1 = carry
        state, res = frame(state, p2, p1, PTS_S[k % K] + eps,
                           PTS[k % K], NRM[k % K], rgb)
        return (state, p1, res.pose)
    return jax.lax.fori_loop(0, K, body, (state, pose_prev2, pose_prev))


def reps(state, n, tag):
    times = []
    for r in range(n):
        t0 = time.perf_counter()
        state, _, p = run_k(state, poses[0], poses[0],
                            jnp.float32(1e-7 * (r + 1)))
        float(p.t[0])
        times.append((time.perf_counter() - t0) / K * 1e3)
    print(f"{tag}: per-frame ms per rep: "
          f"{['%.1f' % t for t in times]}", flush=True)
    return state, min(times), sorted(times)[len(times) // 2]


state, solo_best, solo_med = reps(state0, 4, "solo")

# concurrent mesher: continuous MC color passes on a snapshot
snap = dense_from_brick_grid(state[0], cfg.grid, (8, 8, 8))
stop = threading.Event()
mesh_times = []


def mesher():
    while not stop.is_set():
        t0 = time.perf_counter()
        m = marching_cubes(snap, params=cfg.grid, with_colors=True,
                           color_mode="trilinear")
        jax.block_until_ready(m.vertices)
        mesh_times.append(time.perf_counter() - t0)


# warm the MC compile before contending
t0 = time.perf_counter()
m = marching_cubes(snap, params=cfg.grid, with_colors=True,
                   color_mode="trilinear")
jax.block_until_ready(m.vertices)
print(f"mesh pass (warm compile incl): {time.perf_counter()-t0:.2f} s",
      flush=True)

th = threading.Thread(target=mesher, daemon=True)
th.start()
state, cont_best, cont_med = reps(state, 6, "contended")
stop.set()
th.join(timeout=30)

mesh_s = min(mesh_times) if mesh_times else float("nan")
print(f"mesh pass steady: {mesh_s:.2f} s x {len(mesh_times)} passes",
      flush=True)
print(f"solo {solo_best:.1f}/{solo_med:.1f} ms (best/med) -> contended "
      f"{cont_best:.1f}/{cont_med:.1f} ms under CONTINUOUS meshing",
      flush=True)
if mesh_s == mesh_s:
    # 1 Hz duty cycle: one mesh pass per max(1s, mesh_s) wall
    duty = mesh_s / max(1.0, mesh_s)
    cost = (cont_med - solo_med) / cont_med * duty
    print(f"implied 1 Hz(auto-degraded) publisher cost: "
          f"~{100*cost:.0f}% of throughput "
          f"(duty {100*duty:.0f}% x contention "
          f"{100*(cont_med-solo_med)/cont_med:.0f}%)", flush=True)

# ---- decimated live publisher (config.mesh_decimate) --------------------
for dec in (2, 4):
    dsnap = jax.tree.map(lambda a: a[::dec, ::dec, ::dec], snap)
    dparams = cfg.grid._replace(m=cfg.grid.m // dec)
    m = marching_cubes(dsnap, params=dparams, with_colors=True,
                       color_mode="trilinear")
    jax.block_until_ready(m.vertices)  # compile
    best = float("inf")
    for r in range(3):
        d2 = jax.tree.map(lambda a: a + jnp.zeros_like(a), dsnap)
        t0 = time.perf_counter()
        m = marching_cubes(d2, params=dparams, with_colors=True,
                           color_mode="trilinear")
        jax.block_until_ready(m.vertices)
        best = min(best, time.perf_counter() - t0)
    print(f"decimate-{dec} mesh pass: {best:.2f} s "
          f"({int(m.num_triangles)} tris)", flush=True)
    stop2 = threading.Event()
    dtimes = []

    def mesher_d(dsnap=dsnap, dparams=dparams, stop2=stop2, dtimes=dtimes):
        i = 0
        while not stop2.is_set():
            t0 = time.perf_counter()
            mm = marching_cubes(
                jax.tree.map(lambda a: a + jnp.float32(i * 1e-7)
                             if a.dtype != jnp.int32 else a, dsnap),
                params=dparams, with_colors=True, color_mode="trilinear")
            jax.block_until_ready(mm.vertices)
            dtimes.append(time.perf_counter() - t0)
            i += 1
            # 1 Hz-style pacing: sleep out the remainder of the second
            rem = 1.0 - (time.perf_counter() - t0)
            if rem > 0 and not stop2.is_set():
                time.sleep(rem)

    th2 = threading.Thread(target=mesher_d, daemon=True)
    th2.start()
    state, db, dm_ = reps(state, 5, f"contended 1Hz decimate-{dec}")
    stop2.set()
    th2.join(timeout=30)
    print(f"  1 Hz decimate-{dec} publisher: frame med {dm_:.1f} ms vs "
          f"solo {solo_med:.1f} -> cost "
          f"{100*(dm_-solo_med)/dm_:.0f}%", flush=True)
