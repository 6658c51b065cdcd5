"""Probe: brick-major fusion building blocks on hardware.

1. Row merge: gather NROW brick rows from a (NB, RW) table, axpy, scatter-set
   back — for RW=512 (one leaf) and RW=512*6 (all channels concatenated).
2. Relayout: brick-major (NB, 512) D and W -> flat (m, m, m) masked Dm
   (the per-frame handoff to tracking/raycast).
3. Brick-row scatter-ADD into a zero accumulator (alternative merge tail).

All probes k-dependent (rolled indices / perturbed values); one fori_loop
dispatch; value-fetch forced; best of 3. Tables are passed as jit ARGUMENTS
(a closure-captured device array becomes a graph constant and the remote
compile helper rejects >~100 MB request bodies).
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

M = 256
BS = (8, 8, 8)
BV = BS[0] * BS[1] * BS[2]
NB = (M // BS[0]) * (M // BS[1]) * (M // BS[2])
NROW = 7168
KITER = 30

key = jax.random.PRNGKey(0)


def bench(name, run, *args):
    _ = float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, (time.perf_counter() - t0) / KITER)
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)
    return best


d = jax.devices()[0]
print(f"device: {d.platform}:{d.device_kind}  NB={NB} NROW={NROW} K={KITER}",
      flush=True)

rows0 = jax.random.permutation(key, NB)[:NROW].astype(jnp.int32)


@jax.jit
def rowmerge(tab, upd, rows0):
    def body(k, carry):
        t, acc = carry
        r = (rows0 + k) % NB
        old = jnp.take(t, r, axis=0)
        new = old + upd * (1.0 + 1e-7 * k)
        t = t.at[r].set(new, mode="drop", unique_indices=True)
        return (t, acc + new[0, 0])
    t, acc = jax.lax.fori_loop(0, KITER, body, (tab, jnp.float32(0.0)))
    return acc + t[0, 0]


@jax.jit
def scatteradd(tab, upd, rows0):
    def body(k, carry):
        t, acc = carry
        r = (rows0 + k) % NB
        t = t.at[r].add(upd * (1.0 + 1e-7 * k), mode="drop",
                        unique_indices=True)
        return (t, acc + t[0, 0])
    t, acc = jax.lax.fori_loop(0, KITER, body, (tab, jnp.float32(0.0)))
    return acc + t[0, 0]


@jax.jit
def relayout(Db, Wb):
    bi, bj, bk = BS
    nbi, nbj, nbk = M // bi, M // bj, M // bk

    def body(k, acc):
        D = Db * (1.0 + 1e-7 * k)
        Dm = jnp.where(Wb > 0, D, jnp.nan)
        flat = (
            Dm.reshape(nbi, nbj, nbk, bi, bj, bk)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(M, M, M)
        )
        return acc + flat[0, 0, 0] + flat[M - 1, M - 1, M - 1]
    return jax.lax.fori_loop(0, KITER, body, jnp.float32(0.0))


@jax.jit
def relayout_geo(G):
    """Relayout when D, W live interleaved in one (NB, BV, 2) geo table."""
    bi, bj, bk = BS
    nbi, nbj, nbk = M // bi, M // bj, M // bk

    def body(k, acc):
        D = G[..., 0] * (1.0 + 1e-7 * k)
        Dm = jnp.where(G[..., 1] > 0, D, jnp.nan)
        flat = (
            Dm.reshape(nbi, nbj, nbk, bi, bj, bk)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(M, M, M)
        )
        return acc + flat[0, 0, 0] + flat[M - 1, M - 1, M - 1]
    return jax.lax.fori_loop(0, KITER, body, jnp.float32(0.0))


tab1 = jax.random.normal(key, (NB, 512), jnp.float32)
upd1 = jax.random.normal(jax.random.PRNGKey(1), (NROW, 512), jnp.float32)
bench("rowmerge rw=512 (one leaf)", rowmerge, tab1, upd1, rows0)

tab6 = jax.random.normal(key, (NB, 6 * 512), jnp.float32)
upd6 = jax.random.normal(jax.random.PRNGKey(1), (NROW, 6 * 512), jnp.float32)
bench("rowmerge rw=3072 (6 leaves concat)", rowmerge, tab6, upd6, rows0)
del tab6, upd6

bench("scatter-add rw=512", scatteradd, tab1, upd1, rows0)
del tab1, upd1

Db = jax.random.normal(key, (NB, BV), jnp.float32)
Wb = jax.random.uniform(jax.random.PRNGKey(2), (NB, BV), jnp.float32) - 0.3
bench("relayout bricks->flat masked Dm", relayout, Db, Wb)
del Db, Wb

G = jax.random.normal(key, (NB, BV, 2), jnp.float32)
bench("relayout from (NB,BV,2) geo table", relayout_geo, G)
