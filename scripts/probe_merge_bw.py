"""Merge row-op bandwidth: random vs contiguous rows, gather vs scatter.

The 512^3 merge moves ~622 MB of rows in ~19 ms (~33 GB/s) while
contiguous full-grid passes run ~200 GB/s. This probe separates the
candidate causes:
  * random 1-2 KB row access (DRAM row-buffer locality) vs
  * the gather/scatter-set op formulation itself.
Arms: {random sorted-sparse rows, contiguous arange rows} x {gather-only,
scatter-only, gather+merge+scatter}.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

NB = 262144
BV = 512
CAP = 38912
K = 10

key = jax.random.PRNGKey(0)
rows_rand = jnp.sort(jax.random.choice(key, NB, (CAP,), replace=False)
                     ).astype(jnp.int32)
rows_seq = jnp.arange(CAP, dtype=jnp.int32)
tab_bf16 = jnp.zeros((NB, BV), jnp.bfloat16)
tab_f32 = jnp.zeros((NB, BV), jnp.float32)
upd = jnp.ones((CAP, BV), jnp.float32)


def timeit(label, fn, *args):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:52s} {best*1e3:8.2f} ms", flush=True)


def mk_gather(tab):
    @jax.jit
    def g(tab, rows):
        def body(k, acc):
            got = jnp.take(tab, (rows + k) % NB, axis=0).astype(jnp.float32)
            return acc + jnp.sum(got[:, :1])
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    return g


def mk_set(tab):
    @jax.jit
    def s(tab, rows):
        def body(k, t):
            return t.at[(rows + k) % NB].set(
                (upd + k).astype(t.dtype), mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, K, body, tab)
    return s


def mk_rmw(tab):
    @jax.jit
    def r(tab, rows):
        def body(k, t):
            rr = (rows + k) % NB
            old = jnp.take(t, rr, axis=0).astype(jnp.float32)
            return t.at[rr].set((old * 0.5 + upd).astype(t.dtype),
                                mode="drop", unique_indices=True)
        return jax.lax.fori_loop(0, K, body, tab)
    return r


for tname, tab in (("bf16(1KB rows)", tab_bf16), ("f32(2KB rows)", tab_f32)):
    for rname, rows in (("random", rows_rand), ("contiguous", rows_seq)):
        timeit(f"{tname} {rname}: gather only", mk_gather(tab), tab, rows)
        timeit(f"{tname} {rname}: scatter-set only", mk_set(tab), tab, rows)
        timeit(f"{tname} {rname}: gather+merge+set", mk_rmw(tab), tab, rows)
