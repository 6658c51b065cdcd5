"""Probe: is native (NB*4, 128) brick-row storage a win over (NB, 512)?

The fuse HLO (probe_fuse_hlo) shows emit_dm="view" materializes a 67 MB
f32[131072,128] output: the (32768,512) -> (-1,128) reshape is a TPU
relayout (T(8,128) tiling differs), not a bitcast. Storing leaves natively
at width 128 removes that copy but quadruples the ROW COUNT of every merge
gather/scatter (~8 ns/row overhead each, x16 ops/frame).

Arms (each: K-iteration fori_loop, k-dependent rows/values, loop-carried
table so nothing is LICM-hoisted; consumer gather forces the view):
  wide512    : 6-leaf scatter-set of (cap,512) rows into (32768,512)
               tables + reshape(-1,128) of D + consumer row-gather
  narrow128  : 6-leaf scatter-set of (4cap,128) rows into (131072,128)
               tables + consumer row-gather (no reshape)
  *_noview   : same minus the reshape/consumer — isolates relayout cost
  gather-only arms: take() cost at both row shapes, same bytes.
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K = 20
NB, BV = 32768, 512
CAP = 6144
NTRACK = 8 * 8192  # consumer gather rows (~tracking first-iter corner load)

key = jax.random.PRNGKey(0)
rows_base = jax.random.permutation(key, NB)[:CAP].astype(jnp.int32)
tr_base = jax.random.randint(key, (NTRACK,), 0, NB * 4).astype(jnp.int32)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:34s} {best*1e3:8.3f} ms", flush=True)
    return best


def loop6(body, tabs):
    @jax.jit
    def run(tabs):
        def step(k, carry):
            tabs, acc = carry
            tabs, add = body(tabs, k)
            return (tabs, acc + add)
        tabs, acc = jax.lax.fori_loop(0, K, step, (tabs, jnp.float32(0)))
        return acc + sum(jnp.sum(t[0, :4]) for t in tabs)
    return lambda: run(tabs)


tabs512 = tuple(jnp.zeros((NB, BV), jnp.float32) + i for i in range(6))
tabs128 = tuple(jnp.zeros((NB * 4, 128), jnp.float32) + i for i in range(6))


def roll(r, k, n):
    return (r + k) % n


# ---- merge arms ----------------------------------------------------------
def body512(tabs, k, view):
    rs = roll(rows_base, k, NB)
    vals = jnp.full((CAP, BV), 1.0 + k * 1e-6, jnp.float32)
    tabs = tuple(t.at[rs].set(vals + i, unique_indices=True)
                 for i, t in enumerate(tabs))
    if view:
        v = tabs[0].reshape(-1, 128)
        got = jnp.take(v, roll(tr_base, k, NB * 4), axis=0)
        return tabs, jnp.sum(got[::1313])
    return tabs, vals[0, 0]


def body128(tabs, k, view):
    rs = roll(rows_base, k, NB)
    rs4 = (rs[:, None] * 4 + jnp.arange(4, dtype=jnp.int32)).reshape(-1)
    vals = jnp.full((CAP * 4, 128), 1.0 + k * 1e-6, jnp.float32)
    tabs = tuple(t.at[rs4].set(vals + i, unique_indices=True)
                 for i, t in enumerate(tabs))
    if view:
        got = jnp.take(tabs[0], roll(tr_base, k, NB * 4), axis=0)
        return tabs, jnp.sum(got[::1313])
    return tabs, vals[0, 0]


# ---- gather-only arms ----------------------------------------------------
def gonly(tabs, k, narrow):
    if narrow:
        rs = roll(rows_base, k, NB)
        rs4 = (rs[:, None] * 4 + jnp.arange(4, dtype=jnp.int32)).reshape(-1)
        got = jnp.take(tabs[0], rs4, axis=0)
    else:
        got = jnp.take(tabs[0], roll(rows_base, k, NB), axis=0)
    return tabs, jnp.sum(got[::977])


t512v = timeit("wide512 scatter6+view+consume", loop6(
    lambda t, k: body512(t, k, True), tabs512))
t128v = timeit("narrow128 scatter6+consume", loop6(
    lambda t, k: body128(t, k, True), tabs128))
t512 = timeit("wide512 scatter6 only", loop6(
    lambda t, k: body512(t, k, False), tabs512))
t128 = timeit("narrow128 scatter6 only", loop6(
    lambda t, k: body128(t, k, False), tabs128))
g512 = timeit("gather cap x 512w", loop6(
    lambda t, k: gonly(t, k, False), tabs512))
g128 = timeit("gather 4cap x 128w", loop6(
    lambda t, k: gonly(t, k, True), tabs128))

print(f"\nrelayout+consume delta (view arms): {(t512v-t128v)*1e3:+.3f} ms")
print(f"pure 6-leaf scatter delta (128-512): {(t128-t512)*1e3:+.3f} ms")
print(f"gather delta per op (128-512):       {(g128-g512)*1e3:+.3f} ms")
