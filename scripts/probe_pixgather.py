"""Probe: pixel-row gather microstructure (fusion's dominant cost).

Gathers N rows from a (T, C) pixel table, varying:
  * index minor-dim width L (the lowering vectorizes over it)
  * table row width C (9 = current fusion channels; 8/16 = power-of-two)

k-dependent (indices rolled by k), one fori_loop dispatch, best of 3.
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

T = 640 * 480
N = 1_572_864  # = 6144 * 256 rows (cap * bi*bj*bk/share at share=2)
KITER = 20

key = jax.random.PRNGKey(0)
idx0 = jax.random.randint(key, (N,), 0, T, jnp.int32)


def bench(name, run, *args):
    _ = float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, (time.perf_counter() - t0) / KITER)
    print(f"{name:36s} {best*1e3:8.2f} ms  ({best/N*1e9:5.2f} ns/row)",
          flush=True)
    return best


def make(L):
    @jax.jit
    def run(tab, idx):
        def body(k, acc):
            i = ((idx + k) % T).reshape(N // L, L)
            g = jnp.take(tab, i, axis=0)
            return acc + g[0, 0, 0] + g[-1, -1, -1]
        return jax.lax.fori_loop(0, KITER, body, jnp.float32(0.0))
    return run


d = jax.devices()[0]
print(f"device: {d.platform}:{d.device_kind}  T={T} N={N} K={KITER}", flush=True)

for C in (8, 9, 16):
    tab = jax.random.normal(key, (T, C), jnp.float32)
    for L in (128, 512, 2048):
        bench(f"C={C:3d} idx minor L={L}", make(L), tab, idx0)
    del tab

# bf16 table: same row count, half the bytes
tab16 = jax.random.normal(key, (T, 9), jnp.float32).astype(jnp.bfloat16)


@jax.jit
def run_bf16(tab, idx):
    def body(k, acc):
        i = ((idx + k) % T).reshape(N // 128, 128)
        g = jnp.take(tab, i, axis=0)
        return acc + jnp.float32(g[0, 0, 0]) + jnp.float32(g[-1, -1, -1])
    return jax.lax.fori_loop(0, KITER, body, jnp.float32(0.0))


bench("C=9 bf16 idx minor L=128", run_bf16, tab16, idx0)
