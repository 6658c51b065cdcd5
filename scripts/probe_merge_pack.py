"""Microprobe: is the brickmajor merge row-op count worth collapsing?

The merge tail does 6 leaf-gathers + 6 scatter-sets of (cap, BV) rows per
frame; measured per-row cost is near-independent of row width (fat-row
ledger entry). Hypothesis: grouping leaves by dtype — values (D,R,G,B)
bf16 as ONE (NB, 4*BV) array, weights (W,Wc) f32 as ONE (NB, 2*BV) —
cuts row-ops 3x for the same bytes, saving ~2/3 of the ~22 ms merge at
512^3. (Distinct from the REJECTED fully-packed (NB, 6, BV) layout,
whose single fat gather pulled all channels for every consumer and lost
at 256^3 — here each merge still reads exactly what it needs.)

Times gather + axpy-style elementwise + scatter-set loops at tum512 row
counts for: six (NB, BV) leaves vs value/weight grouped arrays, both at
the preset's bf16-values/f32-weights dtypes.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

NB = 262144  # 512^3 / 8^3 bricks
BV = 512
CAP = 38912
K = 10


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:46s} {best*1e3:8.2f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
rows = jax.random.randint(key, (CAP,), 0, NB, dtype=jnp.int32)
upd = jnp.ones((CAP, BV), jnp.float32)

# ---- six separate leaves (current layout) ---------------------------------
leaves6 = [jnp.zeros((NB, BV), jnp.bfloat16) for _ in range(4)] + [
    jnp.zeros((NB, BV), jnp.float32) for _ in range(2)]


@jax.jit
def merge6(leaves, rows):
    def body(k, ls):
        r = (rows + k) % NB
        out = []
        for t in ls:
            old = jnp.take(t, r, axis=0).astype(jnp.float32)
            new = old * 0.5 + upd
            out.append(t.at[r].set(new.astype(t.dtype), mode="drop",
                                   unique_indices=True))
        return tuple(out)
    return jax.lax.fori_loop(0, K, body, tuple(leaves))


# ---- grouped: values (NB, 4*BV) bf16 + weights (NB, 2*BV) f32 --------------
vals = jnp.zeros((NB, 4 * BV), jnp.bfloat16)
wts = jnp.zeros((NB, 2 * BV), jnp.float32)
upd4 = jnp.ones((CAP, 4 * BV), jnp.float32)
upd2 = jnp.ones((CAP, 2 * BV), jnp.float32)


@jax.jit
def merge2(vals, wts, rows):
    def body(k, carry):
        v, w = carry
        r = (rows + k) % NB
        vo = jnp.take(v, r, axis=0).astype(jnp.float32)
        wo = jnp.take(w, r, axis=0)
        vn = vo * 0.5 + upd4
        wn = wo * 0.5 + upd2
        v = v.at[r].set(vn.astype(v.dtype), mode="drop", unique_indices=True)
        w = w.at[r].set(wn, mode="drop", unique_indices=True)
        return (v, w)
    return jax.lax.fori_loop(0, K, body, (vals, wts))


timeit("six (NB,512) leaves: 6 gathers + 6 sets", merge6, leaves6, rows)
timeit("grouped (NB,2048)bf16+(NB,1024)f32: 2+2", merge2, vals, wts, rows)
