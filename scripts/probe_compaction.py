"""Compaction-primitive shootout at 512^3 brick counts (round-3 item 4).

The classify stage's two jnp.nonzero(size=cap) calls over NB=262,144 cost
~4.8 ms on the TPU (probe_classify_breakdown: 8.18 - 3.41 classify). This
probe races compaction variants on REAL brick_class data so the winner can
replace them:

  nonzero      jnp.nonzero(flags, size=cap)                      [baseline]
  cumsum+scat  pos = cumsum(flags)-1; buf.at[where(flag,pos,cap)].set(ids)
  2level+scat  per-64-segment cumsum + 4096-segment base offsets + scatter
  padded-seg   NO global compaction: per-super slot = super_rank*64+local
               (requires cap >= 64 * n_mixed_supers — measures the trick of
               compacting at SUPER granularity only)

All must reproduce nonzero's sorted-prefix output exactly (asserted on the
first frame). Probe rules: K iters one dispatch, k-varied inputs, fetch.
"""
import os
import sys
import time

os.environ.setdefault("BENCH_PRESET", "tum512")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as B
from tracking_sdf_tpu.fusion.brick import classify_bricks

K = 20
cfg, cam, poses, PTS, NRM, PTS_S, rgb = B.build_inputs()
params = cfg.grid
bs = cfg.fusion.brick_shape
m = params.m
NB = (m // bs[0]) * (m // bs[1]) * (m // bs[2])
cap = cfg.fusion.brick_cap
f32 = jnp.float32

# real classification masks for the bench frames (is_full per frame)
FLAGS = jnp.stack([
    (classify_bricks(params, poses[k + 1], PTS[k], NRM[k], cam, bs, f32,
                     m // bs[0], 0).reshape(-1) == 2)
    for k in range(B.K)
])
print("n_full per frame:", [int(x) for x in FLAGS.sum(1)], flush=True)


def timeit(label, fn):
    @jax.jit
    def run(flags_all):
        def body(k, acc):
            ids = fn(flags_all[k % B.K])
            return acc + ids[0] + ids[cap - 1]
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    int(run(FLAGS))
    best = float("inf")
    for rep in range(3):
        fl = jnp.roll(FLAGS, rep, axis=1)  # vary content per rep
        jax.block_until_ready(fl)
        t0 = time.perf_counter()
        int(run(fl))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:20s} {best*1e3:8.3f} ms", flush=True)
    return best


def v_nonzero(flags):
    return jnp.nonzero(flags, size=cap, fill_value=NB)[0]


def v_cumsum(flags):
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    tgt = jnp.where(flags, jnp.minimum(pos, cap - 1), cap)
    buf = jnp.full((cap + 1,), NB, jnp.int32)
    ids = jnp.arange(NB, dtype=jnp.int32)
    # later writes win on collision at cap-1; we only need the valid prefix
    return buf.at[tgt].set(ids, mode="drop")[:cap]


def v_2level(flags):
    f2 = flags.reshape(-1, 64).astype(jnp.int32)  # (4096, 64)
    within = jnp.cumsum(f2, axis=1) - 1
    seg = f2.sum(1)
    base = jnp.cumsum(seg) - seg  # exclusive
    pos = base[:, None] + within
    tgt = jnp.where(f2 > 0, jnp.minimum(pos, cap - 1), cap)
    buf = jnp.full((cap + 1,), NB, jnp.int32)
    ids = jnp.arange(NB, dtype=jnp.int32).reshape(-1, 64)
    return buf.at[tgt].set(ids, mode="drop")[:cap]


def v_2level_2d(flags):
    # same as 2level but scatter with 2D-shaped index/value arrays
    f2 = flags.reshape(-1, 64).astype(jnp.int32)
    within = jnp.cumsum(f2, axis=1) - 1
    seg = f2.sum(1)
    base = jnp.cumsum(seg) - seg
    pos = base[:, None] + within
    tgt = jnp.where(f2 > 0, jnp.minimum(pos, cap - 1), cap)
    buf = jnp.full((cap + 1,), NB, jnp.int32)
    ids = jnp.arange(NB, dtype=jnp.int32).reshape(-1, 64)
    out = buf.at[tgt.reshape(-1, 128)].set(ids.reshape(-1, 128), mode="drop")
    return out[:cap]


# correctness vs baseline on frame 0
ref = np.asarray(v_nonzero(FLAGS[0]))
for name, fn in (("cumsum", v_cumsum), ("2level", v_2level),
                 ("2level2d", v_2level_2d)):
    got = np.asarray(fn(FLAGS[0]))
    nf = int(FLAGS[0].sum())
    assert (got[:nf] == ref[:nf]).all(), f"{name} mismatch in valid prefix"
    assert (got[nf:] >= NB).all() or (got[nf:] == ref[nf:]).all(), name
print("correctness ok", flush=True)

timeit("nonzero(size)", v_nonzero)
timeit("cumsum+scatter", v_cumsum)
timeit("2level+scatter", v_2level)
timeit("2level 2d-scatter", v_2level_2d)
