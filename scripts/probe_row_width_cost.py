"""Is the merge's gather/scatter cost per-ROW or per-BYTE? (color-pack A/B
groundwork, round 5)

The 512^3 split probe puts color at 18.45 ms/color-frame = 4 extra bf16
leaves (R, G, B, Wc) x (gather + scatter-set) on 28672 rows. If row cost is
width-insensitive (per-row bound), packing the four color leaves into ONE
(NB, 4*BV) leaf cuts color's row ops 4x -> ~14 ms saved on color frames.
If the cost is bandwidth-bound, packing saves nothing. This probe times
jnp.take + .at[rows].set on (NB, W) bf16 tables for W = 512, 1024, 2048,
4096 at n_rows = 28672, and n_rows = 6144 at W = 512/2048 (the 256^3 cap).

Each op runs K times in one fori_loop with k-perturbed row ids and
k-dependent values (LICM-proofed); every rep fetches a scalar.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K = 10
NB = 262144  # 512^3 / 8^3 bricks


def probe(n_rows, width, mode):
    tab0 = jnp.zeros((NB, width), jnp.bfloat16)
    ids0 = (jnp.arange(n_rows, dtype=jnp.int32) * 37) % NB

    if mode == "gather":
        @jax.jit
        def run(tab, ids):
            def body(k, acc):
                rows = (ids + k) % NB
                g = jnp.take(tab, rows, axis=0)
                return acc + g.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        out = run(tab0, ids0)
        _ = float(out)
        best = float("inf")
        for _r in range(3):
            t0 = time.perf_counter()
            _ = float(run(tab0, ids0 + _r))
            best = min(best, (time.perf_counter() - t0) / K)
    else:
        vals0 = jnp.ones((n_rows, width), jnp.bfloat16)

        @jax.jit
        def run(tab, ids):
            def body(k, tab):
                rows = (ids + k) % NB
                v = vals0 * (1.0 + k).astype(jnp.bfloat16)
                return tab.at[rows].set(v, mode="drop",
                                        unique_indices=True)
            return jax.lax.fori_loop(0, K, body, tab)

        tab = run(tab0, ids0)
        _ = float(tab.ravel()[0])
        best = float("inf")
        for _r in range(3):
            t0 = time.perf_counter()
            tab = run(tab, ids0 + _r)
            _ = float(tab.ravel()[0])
            best = min(best, (time.perf_counter() - t0) / K)
    mb = n_rows * width * 2 / 1e6
    print(f"{mode:7s} rows={n_rows:6d} w={width:5d} ({mb:7.1f} MB) "
          f"{best*1e3:8.3f} ms  {mb/best/1e3:6.1f} GB/s", flush=True)


for mode in ("gather", "scatter"):
    for n_rows, width in ((28672, 512), (28672, 1024), (28672, 2048),
                          (28672, 4096), (6144, 512), (6144, 2048)):
        probe(n_rows, width, mode)
