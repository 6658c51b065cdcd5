"""Probe: where brick-major fusion's per-brick 14 ms goes.

Stages (each a jitted K-iteration on-device loop, k-perturbed pose):
  pixtable   : _pixel_table alone
  classify   : + classify_bricks (zeta mip + corner math + query)
  updates    : + _full_brick_updates summed (adds compaction + pixel gather
               + per-voxel math) — NO merge
  updates_seq: same but gather indices replaced with sequential rows —
               isolates the RANDOMNESS cost of the pixel gather
  fuse       : full fuse_frame_brickmajor (-dm, +color) — adds the merge
Harness floor: an empty loop body measures the fori_loop overhead to
subtract (~1.6 ms at K=20; see probe_gn_loop).
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.fusion.brick import (
    _full_brick_updates, _pixel_table, classify_bricks)
from tracking_sdf_tpu.fusion.brickmajor import (
    brick_grid_from_dense, fuse_frame_brickmajor)
from tracking_sdf_tpu.core.lie import Pose

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
fcfg = cfg.fusion._replace(mode="bricked")
bs = (8, 8, 8)
cap = fcfg.brick_cap
m = params.m
nbi = m // bs[0]
nb3 = (nbi, m // bs[1], m // bs[2])
hw = PTS.shape[1:3]
dense0 = B._bootstrap(cfg, cam, poses, rgb)
bg0 = brick_grid_from_dense(dense0, bs)
pose0 = poses[0]
pts, nrm = PTS[0], NRM[0]


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:26s} {best*1e3:8.2f} ms", flush=True)
    return best


def perturb(pose, k):
    return Pose(pose.R, pose.t + 1e-6 * k)


def loop(body):
    @jax.jit
    def run(pose):
        return jax.lax.fori_loop(
            0, K, lambda k, acc: acc + body(perturb(pose, k), k),
            jnp.float32(0.0))
    return run


h0 = timeit("harness floor", loop(lambda p, k: p.t[0]), pose0)

t_pix = timeit("pixtable", loop(
    lambda p, k: jnp.sum(_pixel_table(pts + 0 * p.t[0], nrm, rgb, True,
                                      jnp.float32)[::977])), pose0)


def body_classify(p, k):
    pix = _pixel_table(pts, nrm, rgb, True, jnp.float32)
    bc = classify_bricks(params, p, pts, nrm, cam, bs, jnp.float32, nbi, 0)
    return jnp.sum(pix[::977]) + jnp.float32(jnp.sum(bc))


t_cls = timeit("+classify", loop(body_classify), pose0)


def body_updates(p, k):
    pix = _pixel_table(pts, nrm, rgb, True, jnp.float32)
    bc = classify_bricks(params, p, pts, nrm, cam, bs, jnp.float32, nbi, 0)
    upd, full_ids, vb, n_full, _ = _full_brick_updates(
        bc, pix, p, params, cam, fcfg, bs, cap, jnp.float32,
        nb3, 0, hw, True)
    return sum(jnp.sum(u[::7, 0, 0, :]) for u in upd) + 0.0 * n_full


t_upd = timeit("+updates (gather+math)", loop(body_updates), pose0)

# standalone pixel-row gathers at the fusion's exact shape: cap*8*8*4 rows
# (pixel_share=2) of 8 floats, random vs sequential indices
share = fcfg.pixel_share
n_rows = cap * bs[0] * bs[1] * (bs[2] // share)
pix0 = _pixel_table(pts, nrm, rgb, True, jnp.float32)
idx_rand = jax.random.randint(
    jax.random.PRNGKey(0), (n_rows // 128, 128), 0, pix0.shape[0])
idx_seq = (jnp.arange(n_rows, dtype=jnp.int32) % pix0.shape[0]).reshape(
    n_rows // 128, 128)


def make_gather(idx):
    def body(p, k):
        g = jnp.take(pix0, (idx + k) % pix0.shape[0], axis=0)
        return jnp.sum(g[::991, :, 0]) + 0.0 * p.t[0]
    return body


t_gr = timeit(f"gather rand ({n_rows} rows)", loop(make_gather(idx_rand)), pose0)
t_gs = timeit("gather seq  (same rows)", loop(make_gather(idx_seq)), pose0)

fuse = lambda bgc, p: fuse_frame_brickmajor(
    bgc, p, pts, nrm, rgb, params=params, cam=cam, cfg=fcfg, bs=bs,
    cap=cap, cap_free=2048, emit_dm=False)


@jax.jit
def run_fuse(bg, pose):
    def bdy(k, carry):
        bg, acc = carry
        bg2, _, st = fuse(bg, perturb(pose, k))
        return (bg2, acc + 0.0 * st.n_full)
    bg, acc = jax.lax.fori_loop(0, K, bdy, (bg, jnp.float32(0.0)))
    # consume every leaf: the final grid must be materialized or XLA
    # DCEs the whole merge chain across the loop (measured 2.7 ms "fuse")
    return acc + sum(jnp.sum(l[::librow]) for l in bg)


librow = 4097


t_fuse = timeit("full fuse (-dm +color)", run_fuse, bg0, pose0)

f = 1e3
print(f"  net: pixtable {(t_pix-h0)*f:.2f} | classify {(t_cls-t_pix)*f:.2f}"
      f" | updates {(t_upd-t_cls)*f:.2f} | merge {(t_fuse-t_upd)*f:.2f}"
      f" | total {(t_fuse-h0)*f:.2f}")
print(f"  gather: random {(t_gr-h0)*f:.2f} vs sequential {(t_gs-h0)*f:.2f} "
      f"-> randomness cost {(t_gr-t_gs)*f:.2f}; "
      f"updates minus gather = math/compaction {(t_upd-t_cls-(t_gr-h0))*f:.2f}")
