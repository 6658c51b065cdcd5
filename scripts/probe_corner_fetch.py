"""Probe: corner-fetch gather variants for tracking interpolation.

Current: 8 width-128 rows per pixel (4 (i,j) pairs x 2 k-rows), 512 B/row
-> 139 MB gathered per GN iteration at 34k pixels; likely bandwidth-bound.
Candidates gather narrower rows (same 8 corner values):
  * w8x2:  8 width-8 rows from the plain (N/8, 8) view (no layout change)
  * t16:   4 width-16 rows from an overlapped (N/8, 16) table
           (row r = flat[8r : 8r+16]; both k-lanes always in one row)
  * t32s16: 4 width-32 rows, stride 16 (half the table rows of t16)
All produce bit-identical corner values; timed K times in one on-device
fori_loop with k-perturbed query positions (LICM-proofed), best of 3.
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

import bench as B
from tracking_sdf_tpu.grid.grid import world_to_voxel
from tracking_sdf_tpu.grid.interp import _OFF4, masked_view
from tracking_sdf_tpu.core.lie import Pose

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
dense0 = B._bootstrap(cfg, cam, poses, rgb)
Dm0 = masked_view(dense0.D, dense0.W)
pose0 = poses[0]
pts = jnp.nan_to_num(PTS_S[0])
m = params.m
N = m * m * m


def base_coords(pose, k):
    x = jnp.einsum("ij,nj->ni", pose.R, pts) + pose.t + 1e-6 * k
    uvw = world_to_voxel(params, x)
    return jnp.floor(uvw).astype(jnp.int32)


def corner_f0(base):
    """(n, 4) flat index of k0 corner per (i,j) pair + (k1-k0) (n,)."""
    off = jnp.asarray(_OFF4)
    ci = jnp.clip(base[..., 0, None] + off[:, 0], 0, m - 1)
    cj = jnp.clip(base[..., 1, None] + off[:, 1], 0, m - 1)
    k0 = jnp.clip(base[..., 2], 0, m - 1)
    k1 = jnp.clip(base[..., 2] + 1, 0, m - 1)
    f0 = (ci * m + cj) * m + k0[..., None]
    return f0, (k1 - k0)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:36s} {best*1e3:8.3f} ms", flush=True)
    return out


def reduce8(vals):  # (n, 8) -> scalar checksum (NaN-safe)
    return jnp.sum(jnp.nan_to_num(vals[::37]))


# ---- current: 8 width-128 rows ------------------------------------------
@jax.jit
def run_w128(Dm, pose):
    t = Dm.reshape(N // 128, 128)

    def body(k, acc):
        bse = base_coords(pose, k)
        f0, dk = corner_f0(bse)
        r0 = f0 // 128
        rows = jnp.stack([r0, r0 + 1], axis=-1).reshape(-1, 8)
        got = jnp.take(t, rows, axis=0, mode="clip").reshape(-1, 4, 256)
        lane0 = f0 - r0 * 128
        lane1 = lane0 + dk[:, None]
        io = jnp.arange(256, dtype=jnp.int32)
        v0 = jnp.sum(jnp.where(io == lane0[..., None], got, 0.0), axis=-1)
        v1 = jnp.sum(jnp.where(io == lane1[..., None], got, 0.0), axis=-1)
        return acc + reduce8(jnp.stack([v0, v1], -1).reshape(-1, 8))
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


# ---- w8x2: 8 width-8 rows, plain view -----------------------------------
@jax.jit
def run_w8(Dm, pose):
    t = Dm.reshape(N // 8, 8)

    def body(k, acc):
        bse = base_coords(pose, k)
        f0, dk = corner_f0(bse)
        r0 = f0 // 8
        rows = jnp.stack([r0, r0 + 1], axis=-1).reshape(-1, 8)
        got = jnp.take(t, rows, axis=0, mode="clip").reshape(-1, 4, 16)
        lane0 = f0 - r0 * 8
        lane1 = lane0 + dk[:, None]
        io = jnp.arange(16, dtype=jnp.int32)
        v0 = jnp.sum(jnp.where(io == lane0[..., None], got, 0.0), axis=-1)
        v1 = jnp.sum(jnp.where(io == lane1[..., None], got, 0.0), axis=-1)
        return acc + reduce8(jnp.stack([v0, v1], -1).reshape(-1, 8))
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


def make_t16(Dm):
    A = Dm.reshape(N // 8, 8)
    return jnp.concatenate([A, jnp.roll(A, -1, axis=0)], axis=1)  # (N/8, 16)


@jax.jit
def run_t16(t16, pose):
    def body(k, acc):
        bse = base_coords(pose, k)
        f0, dk = corner_f0(bse)
        r0 = f0 // 8
        got = jnp.take(t16, r0, axis=0)  # (n, 4, 16)
        lane0 = f0 - r0 * 8
        lane1 = lane0 + dk[:, None]
        io = jnp.arange(16, dtype=jnp.int32)
        v0 = jnp.sum(jnp.where(io == lane0[..., None], got, 0.0), axis=-1)
        v1 = jnp.sum(jnp.where(io == lane1[..., None], got, 0.0), axis=-1)
        return acc + reduce8(jnp.stack([v0, v1], -1).reshape(-1, 8))
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


def make_t32s16(Dm):
    A = Dm.reshape(N // 16, 16)
    return jnp.concatenate([A, jnp.roll(A, -1, axis=0)], axis=1)  # (N/16, 32)


@jax.jit
def run_t32(t32, pose):
    def body(k, acc):
        bse = base_coords(pose, k)
        f0, dk = corner_f0(bse)
        r0 = f0 // 16
        got = jnp.take(t32, r0, axis=0)  # (n, 4, 32)
        lane0 = f0 - r0 * 16
        lane1 = lane0 + dk[:, None]
        io = jnp.arange(32, dtype=jnp.int32)
        v0 = jnp.sum(jnp.where(io == lane0[..., None], got, 0.0), axis=-1)
        v1 = jnp.sum(jnp.where(io == lane1[..., None], got, 0.0), axis=-1)
        return acc + reduce8(jnp.stack([v0, v1], -1).reshape(-1, 8))
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


a = timeit("w128x2 (current, 8x512B rows)", run_w128, Dm0, pose0)
b = timeit("w8x2 (8x32B rows, plain view)", run_w8, Dm0, pose0)
t16 = make_t16(Dm0)
jax.block_until_ready(t16)
c = timeit("t16 (4x64B rows, overlapped)", run_t16, t16, pose0)
t32 = make_t32s16(Dm0)
jax.block_until_ready(t32)
d = timeit("t32s16 (4x128B rows, overlapped)", run_t32, t32, pose0)
print("checksums:", [float(x) for x in (a, b, c, d)])

# build cost of the overlapped tables (per call)
@jax.jit
def build_t16(Dm, s):
    return make_t16(Dm + s)
@jax.jit
def build_dm(D, W, s):
    return jnp.where(W > 0, D + s, jnp.nan)
jax.block_until_ready(build_t16(Dm0, 0.0))
jax.block_until_ready(build_dm(dense0.D, dense0.W, 0.0))
for name, fn, args in [("build t16 from Dm", build_t16, (Dm0,)),
                       ("build dense Dm (masked_view)", build_dm,
                        (dense0.D, dense0.W))]:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, 1e-7))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best*1e3:8.3f} ms", flush=True)
