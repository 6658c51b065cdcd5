"""Would packing D+W rows into one table speed the fold merge? (round 5)

The 512^3 fold pass does 4 row ops on cap+cap_free=36864 rows: gather D,
gather W, scatter D, scatter W. Row ops are count-bound (row-width probe),
so one [D|W]-packed table should cut the op pair count 2x. The VIEW
argument does not block it: the tracking view's (NB,512)->(-1,128)
reshape is a tile-relayout COPY of D already, and slicing D out of a
packed table is the same-size copy.

This probe simulates JUST the merge inner pass both ways (same arithmetic,
same row count) plus the per-frame D-extraction copy, so the refactor's
net win is known before touching the storage layout.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K = 10
NB = 262144  # 512^3 / 8^3
BV = 512
N_ROWS = 36864  # cap 28672 + cap_free 8192
delta = 0.05


def timeit(label, fn, *args):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:44s} {best*1e3:8.2f} ms", flush=True)
    return best


ids0 = (jnp.arange(N_ROWS, dtype=jnp.int32) * 37) % NB
w_add = jnp.ones((N_ROWS, BV), jnp.float32)
wd_add = jnp.full((N_ROWS, BV), delta, jnp.float32)

# ---- separate D / W leaves (current layout) ----------------------------
D0 = jnp.full((NB, BV), 0.04, jnp.bfloat16)
W0 = jnp.full((NB, BV), 3.0, jnp.bfloat16)


@jax.jit
def merge_sep(D, W, ids):
    def body(k, carry):
        D, W = carry
        rows = (ids + k) % NB
        Dold = jnp.take(D, rows, axis=0).astype(jnp.float32)
        Wold = jnp.take(W, rows, axis=0).astype(jnp.float32)
        Ds = jnp.where(Wold > 0, Dold, 0.0)
        W_sum = Wold + w_add
        W_new = jnp.minimum(W_sum, 128.0)
        D_new = (Wold * Ds + wd_add) / W_sum
        D = D.at[rows].set(D_new.astype(D.dtype), mode="drop",
                           unique_indices=True)
        W = W.at[rows].set(W_new.astype(W.dtype), mode="drop",
                           unique_indices=True)
        return D, W
    return jax.lax.fori_loop(0, K, body, (D, W))


# ---- packed [D|W] u16-lane leaf ----------------------------------------
DW0 = jnp.concatenate(
    [jax.lax.bitcast_convert_type(D0, jnp.uint16),
     jax.lax.bitcast_convert_type(W0, jnp.uint16)], axis=1)


@jax.jit
def merge_packed(DW, ids):
    def body(k, DW):
        rows = (ids + k) % NB
        old = jnp.take(DW, rows, axis=0)
        Dold = jax.lax.bitcast_convert_type(
            old[:, :BV], jnp.bfloat16).astype(jnp.float32)
        Wold = jax.lax.bitcast_convert_type(
            old[:, BV:], jnp.bfloat16).astype(jnp.float32)
        Ds = jnp.where(Wold > 0, Dold, 0.0)
        W_sum = Wold + w_add
        W_new = jnp.minimum(W_sum, 128.0)
        D_new = (Wold * Ds + wd_add) / W_sum
        new = jnp.concatenate(
            [jax.lax.bitcast_convert_type(D_new.astype(jnp.bfloat16),
                                          jnp.uint16),
             jax.lax.bitcast_convert_type(W_new.astype(jnp.bfloat16),
                                          jnp.uint16)], axis=1)
        return DW.at[rows].set(new, mode="drop", unique_indices=True)
    return jax.lax.fori_loop(0, K, body, DW)


# ---- per-frame D extraction (the view relayout, both layouts) ----------
@jax.jit
def view_sep(D, eps):
    def body(k, acc):
        v = (D + eps * k).reshape(-1, 128)  # tile relayout copy
        return acc + v.astype(jnp.float32).ravel()[k]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


@jax.jit
def view_packed(DW, eps):
    def body(k, acc):
        D = jax.lax.bitcast_convert_type((DW[:, :BV] + eps * k)
                                         .astype(jnp.uint16), jnp.bfloat16)
        v = D.reshape(-1, 128)
        return acc + v.astype(jnp.float32).ravel()[k]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))


timeit("fold merge, separate D/W (4 row ops)", merge_sep, D0, W0, ids0)
timeit("fold merge, packed [D|W] (2 row ops)", merge_packed, DW0, ids0)
timeit("view relayout from separate D", view_sep, D0, jnp.bfloat16(0))
timeit("view extract+relayout from packed", view_packed, DW0,
       jnp.uint16(0))
