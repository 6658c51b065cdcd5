"""Does the remote (axon) backend dedupe repeat dispatches?

Raycast probes measured an impossible 0.1 ms/render (below tunnel RTT)
when the SAME compiled program was re-dispatched with IDENTICAL inputs,
while varied-input reps measured hundreds of ms. If repeat dispatches
short-circuit, every timing loop must vary its inputs per rep (the fuse/
track loops already do — they carry state).

Times a heavy matmul chain: 5 identical dispatches vs 5 varied-input
dispatches.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

N = 4096


@jax.jit
def heavy(x):
    def body(k, a):
        return jnp.tanh(a @ a) + 1e-6 * k
    return jax.lax.fori_loop(0, 30, body, x)[0, 0]


x = jnp.ones((N, N), jnp.float32) * 1e-3
float(heavy(x))  # compile + warm (VALUE fetch: block_until_ready does
# not reliably synchronize through the tunnel — measured 0.3 ms for a
# 4 TFLOP matmul chain)

for label, vary in (("identical inputs", False), ("varied inputs", True)):
    times = []
    for r in range(1, 6):
        xr = x + jnp.float32(1e-9 * r) if vary else x
        float(xr.ravel()[0])
        t0 = time.perf_counter()
        float(heavy(xr))
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:18s} " + " ".join(f"{t:8.1f}" for t in times) + "  ms",
          flush=True)
