"""Pallas TPU kernel: in-place per-brick TSDF merge.

Replaces the XLA tail of brick-compacted fusion (dense accumulator zeros ->
scatter-add -> full-grid elementwise merge) with ONE kernel that visits ONLY
the active (FREE or FULL) bricks and updates the grid arrays IN PLACE via
input/output aliasing:

  * grid dimension = CAP_ACT steps; scalar-prefetched arrays give each step
    its brick id, class, and compacted-update slot; BlockSpec index_maps
    read them so the Pallas pipeline double-buffers the right (BI,BJ,BK)
    blocks of every grid array automatically (PrefetchScalarGridSpec);
  * FREE bricks apply (w=1, d=+delta) computed in-register — their update
    never touches HBM beyond the grid blocks themselves;
  * FULL bricks read their compacted update block (w, w*d[, wc, wc*rgb])
    and fold the running weighted means;
  * untouched (OUT) bricks are never visited — aliasing leaves their memory
    alone. Traffic is proportional to ACTIVE bricks, not the whole grid.

Padding-at-the-FRONT makes the pipeline race-free: slots beyond n_active
point at brick 0 with class PAD=0, whose merge writes BYTE-IDENTICAL content
(w_add = 0 leaves every value unchanged), and they run BEFORE any real
entry, so a real update of brick 0 lands last and in-flight prefetches can
never observe a half-updated block that differs from what they'd have read.

vs the XLA tail (measured at 256^3): eliminates the (NR,32,C) accumulator
(up to 402 MB of zeros + scatter + re-read) and the full-grid merge pass
(~670 MB r/w), both of which dominate fusion cost on TPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracking_sdf_tpu.grid.grid import TSDFGrid

PAD, FREE, FULL = 0, 1, 2


def _merge_kernel_geo(bid_ref, cls_ref, slot_ref,
                      D_ref, W_ref, upd_ref, D_out, W_out, *, delta):
    i = pl.program_id(0)
    c = cls_ref[i]
    D = D_ref[...]
    W = W_ref[...]
    u = upd_ref[0]
    is_free = (c == FREE)
    is_full = (c == FULL)
    w_add = jnp.where(is_full, u[..., 0], jnp.where(is_free, 1.0, 0.0))
    wd_add = jnp.where(is_full, u[..., 1], jnp.where(is_free, delta, 0.0))
    W_new = W + w_add
    has = w_add > 0
    D_out[...] = jnp.where(has, (W * D + wd_add) / jnp.where(has, W_new, 1.0), D)
    W_out[...] = W_new


def _merge_kernel_color(bid_ref, cls_ref, slot_ref,
                        D_ref, W_ref, R_ref, G_ref, B_ref, Wc_ref, upd_ref,
                        D_out, W_out, R_out, G_out, B_out, Wc_out, *, delta):
    i = pl.program_id(0)
    c = cls_ref[i]
    D = D_ref[...]
    W = W_ref[...]
    u = upd_ref[0]
    is_free = (c == FREE)
    is_full = (c == FULL)
    w_add = jnp.where(is_full, u[..., 0], jnp.where(is_free, 1.0, 0.0))
    wd_add = jnp.where(is_full, u[..., 1], jnp.where(is_free, delta, 0.0))
    W_new = W + w_add
    has = w_add > 0
    D_out[...] = jnp.where(has, (W * D + wd_add) / jnp.where(has, W_new, 1.0), D)
    W_out[...] = W_new

    Wc = Wc_ref[...]
    wc_add = jnp.where(is_full, u[..., 2], 0.0)
    Wc_new = Wc + wc_add
    has_c = wc_add > 0
    safe = jnp.where(has_c, Wc_new, 1.0)
    R_out[...] = jnp.where(has_c, (Wc * R_ref[...] + u[..., 3]) / safe, R_ref[...])
    G_out[...] = jnp.where(has_c, (Wc * G_ref[...] + u[..., 4]) / safe, G_ref[...])
    B_out[...] = jnp.where(has_c, (Wc * B_ref[...] + u[..., 5]) / safe, B_ref[...])
    Wc_out[...] = Wc_new


@functools.partial(
    jax.jit,
    static_argnames=("bs", "cap_act", "delta", "fuse_color", "interpret"),
    donate_argnames=("grid",),
)
def merge_active_bricks(
    grid: TSDFGrid,
    upd: jnp.ndarray,       # (cap_full + 1, BI, BJ, BK, C); last slot zeros
    bid: jnp.ndarray,       # (cap_act,) int32 flat brick ids (padding FIRST)
    cls: jnp.ndarray,       # (cap_act,) int32 in {PAD, FREE, FULL}
    slot: jnp.ndarray,      # (cap_act,) int32 row of `upd` (cap_full if not FULL)
    *,
    bs: Tuple[int, int, int],
    cap_act: int,
    delta: float,
    fuse_color: bool,
    interpret: bool = False,
) -> TSDFGrid:
    """Apply FREE/FULL brick updates to the grid in place (donated)."""
    BI, BJ, BK = bs
    nbj, nbk = grid.D.shape[1] // BJ, grid.D.shape[2] // BK

    def grid_map(i, bid_ref, cls_ref, slot_ref):
        b = bid_ref[i]
        return (b // (nbj * nbk), (b // nbk) % nbj, b % nbk)

    def upd_map(i, bid_ref, cls_ref, slot_ref):
        return (slot_ref[i], 0, 0, 0, 0)

    gspec = pl.BlockSpec((BI, BJ, BK), grid_map)
    uspec = pl.BlockSpec((1, BI, BJ, BK, upd.shape[-1]), upd_map)

    if fuse_color:
        kernel = functools.partial(_merge_kernel_color, delta=delta)
        ins = [grid.D, grid.W, grid.R, grid.G, grid.B, grid.Wc, upd]
        in_specs = [gspec] * 6 + [uspec]
        out_shape = [jax.ShapeDtypeStruct(grid.D.shape, grid.D.dtype)] * 6
        out_specs = [gspec] * 6
        # operand indices include the 3 scalar-prefetch args
        aliases = {3 + k: k for k in range(6)}
    else:
        kernel = functools.partial(_merge_kernel_geo, delta=delta)
        ins = [grid.D, grid.W, upd]
        in_specs = [gspec, gspec, uspec]
        out_shape = [jax.ShapeDtypeStruct(grid.D.shape, grid.D.dtype)] * 2
        out_specs = [gspec, gspec]
        aliases = {3 + k: k for k in range(2)}

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap_act,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(bid, cls, slot, *ins)

    if fuse_color:
        D, W, R, G, B, Wc = outs
        return TSDFGrid(D=D, W=W, R=R, G=G, B=B, Wc=Wc)
    D, W = outs
    return TSDFGrid(D=D, W=W, R=grid.R, G=grid.G, B=grid.B, Wc=grid.Wc)
