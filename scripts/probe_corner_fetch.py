"""Probe: tracking corner-fetch variants on hardware.

Variants:
  A) current: 8 width-128 row gathers per query (grid/interp._corner_fetch_rows)
  B) k-line rows: 4 width-m2 (256) row gathers per query — each (i, j) pair's
     full k-line covers both k corners in one row.
  C) B but with lane extraction via take_along_axis instead of iota-select.

All probes are k-dependent (indices rolled by k) to defeat LICM; timed as one
K-iteration fori_loop dispatch, best of 3.
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

M = 256
N = 34240  # ~pixel count at stride 3
KITER = 50

key = jax.random.PRNGKey(0)
vol = jax.random.normal(key, (M, M, M), jnp.float32)
base0 = jax.random.randint(jax.random.PRNGKey(1), (N, 3), 1, M - 2)

from tracking_sdf_tpu.grid.interp import _corner_fetch_rows, _OFF4

_ROW_W = 128


def fetch_klines(vol, base):
    """4 full-k-line rows per query; both k corners from lanes of one row."""
    m0, m1, m2 = vol.shape
    t = vol.reshape(m0 * m1, m2)
    off = jnp.asarray(_OFF4)
    ci = jnp.clip(base[..., 0, None] + off[:, 0], 0, m0 - 1)  # (..., 4)
    cj = jnp.clip(base[..., 1, None] + off[:, 1], 0, m1 - 1)
    k0 = jnp.clip(base[..., 2], 0, m2 - 1)
    k1 = jnp.clip(base[..., 2] + 1, 0, m2 - 1)
    rows = ci * m1 + cj  # (..., 4)
    got = jnp.take(t, rows, axis=0)  # (..., 4, m2)
    io = jnp.arange(m2, dtype=jnp.int32)
    v0 = jnp.sum(jnp.where(io == k0[..., None, None], got, 0.0), axis=-1)
    v1 = jnp.sum(jnp.where(io == k1[..., None, None], got, 0.0), axis=-1)
    return jnp.stack([v0, v1], axis=-1).reshape(*base.shape[:-1], 8)


def fetch_klines_tala(vol, base):
    m0, m1, m2 = vol.shape
    t = vol.reshape(m0 * m1, m2)
    off = jnp.asarray(_OFF4)
    ci = jnp.clip(base[..., 0, None] + off[:, 0], 0, m0 - 1)
    cj = jnp.clip(base[..., 1, None] + off[:, 1], 0, m1 - 1)
    k0 = jnp.clip(base[..., 2], 0, m2 - 1)
    k1 = jnp.clip(base[..., 2] + 1, 0, m2 - 1)
    rows = ci * m1 + cj
    got = jnp.take(t, rows, axis=0)  # (N, 4, m2)
    kk = jnp.stack([k0, k1], -1)[:, None, :]  # (N, 1, 2)
    v = jnp.take_along_axis(got, jnp.broadcast_to(kk, (*rows.shape, 2)), axis=-1)
    return v.reshape(*base.shape[:-1], 8)


def timeit(name, fn):
    @jax.jit
    def run(vol, base):
        def body(k, acc):
            b = (base + k) % (M - 2)  # k-dependent: defeat LICM
            return acc + jnp.sum(fn(vol, b))
        return jax.lax.fori_loop(0, KITER, body, jnp.float32(0.0))

    _ = float(run(vol, base0))  # compile + warm; value fetch forces completion
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(vol, base0))
        best = min(best, (time.perf_counter() - t0) / KITER)
    print(f"{name:28s} {best*1e3:8.3f} ms/call  ({best/N*1e9:6.2f} ns/query)")
    return best


d = jax.devices()[0]
print(f"device: {d.platform}:{d.device_kind}  N={N} queries, {KITER}-iter loop")
timeit("A: 8x width-128 rows", _corner_fetch_rows)
timeit("B: 4x k-line rows (iota)", fetch_klines)
timeit("C: 4x k-line rows (tala)", fetch_klines_tala)
