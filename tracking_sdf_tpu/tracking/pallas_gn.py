"""Pallas fused GN-iteration kernel: trilinear + Jacobian + (J^T J, J^T r)
accumulation in VMEM (SURVEY §7.8 / round-1 VERDICT item 8).

Scope and honest expectations. The tracking iteration's measured cost
(~2.3-2.4 ms at 34k queries) is dominated by the 8-row corner GATHER,
which is shape-invariant (corner-fetch negative result, BENCHMARKS.md) —
no Pallas formulation can beat XLA's gather unit for random HBM rows
(per-row DMAs pay ~us-scale issue overhead x 272k rows). What a kernel
CAN contest is everything AFTER the gather: the trilinear/Jacobian
elementwise chain and the 6x6 normal-equation reduction, which XLA
materializes as (N, 6)/(N, 8) intermediates between fusions. This module
fuses that post-gather pipeline into one VMEM-resident pass per query
tile with an MXU dot for the reduction, so the A/B isolates exactly the
part Pallas can influence.

The interpolation math is the SAME function the XLA path runs
(grid.interp.trilinear_from_corners) — parity by construction, pinned by
tests in interpret mode.

MEASURED VERDICT (BENCHMARKS.md round 2): the corner gather ALONE costs
>= the full production iteration (2.74 vs 2.66 ms at 34k queries) — XLA
hides the entire post-gather pipeline in the gather's latency shadow, so
there is nothing left for a kernel to win; this kernel serializes after
the gather and loses (3.86 ms). Kept as the documented attempt; the
production tracker stays on the XLA path, which is at speed-of-light for
this access pattern (row-issue-rate-bound, not bandwidth-bound).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tracking_sdf_tpu.grid.interp import _OFFSETS as _OFFSETS_NP
from tracking_sdf_tpu.grid.interp import trilinear_from_corners

_Q = 512  # queries per grid step (2048 blew the 16 MB scoped-VMEM limit at
# compile: Mosaic's stack for the (Q, 8, 3) trilinear intermediates hit
# 46.5 MB — the working set scales with Q, the tile count doesn't matter)


def _gn_kernel(d_ref, inb_ref, f_ref, a_ref, scale_ref, off_ref, o_ref):
    d_raw = d_ref[...]                      # (Q, 8) f32, NaN = unobserved
    # inb carries BOTH the bounds mask and the per-query validity (folded
    # in by gn_reduce_pallas: an invalid query = all corners masked ->
    # ok False). A separate (Q,) operand tripped a Mosaic/XLA 1-D layout
    # tiling mismatch; folding removes it.
    inb = inb_ref[...] > 0                  # (Q, 8)
    f = f_ref[...]                          # (Q, 3)
    a = a_ref[...]                          # (Q, 3) = R p (rotation arm)

    value, grad, ok = trilinear_from_corners(d_raw, inb, f, jnp.float32,
                                             off=off_ref[...])
    g_world = grad * scale_ref[0]           # voxel -> world meters

    # J = [g_world, a x g_world]  (cross product unrolled: jnp.cross is
    # slicing-heavy under Mosaic)
    ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
    gx, gy, gz = g_world[:, 0], g_world[:, 1], g_world[:, 2]
    J = jnp.stack(
        [gx, gy, gz, ay * gz - az * gy, az * gx - ax * gz, ax * gy - ay * gx],
        axis=-1,
    )                                       # (Q, 6)
    m = ok.astype(jnp.float32)
    Jm = J * m[:, None]
    rm = value * m

    A = jax.lax.dot_general(                # (6, 6) via MXU
        Jm, Jm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    b = (rm[:, None] * Jm).sum(axis=0)      # (6,)
    # Mosaic requires tile-aligned (8, 128) output blocks: pack A into
    # rows 0-5 and b into row 6 of one padded tile. jnp.pad, not
    # .at[].set — in-kernel scatter does not lower on TPU.
    A_pad = jnp.pad(A, ((0, 2), (0, 122)))
    b_pad = jnp.pad(b[None, :], ((6, 1), (0, 122)))
    o_ref[...] = (A_pad + b_pad)[None]


@partial(jax.jit, static_argnames=("interpret",))
def gn_reduce_pallas(d_raw, inb, f, a, valid_in, scale, interpret=False):
    """(A (6,6), b (6,)) from pre-gathered corners via the fused kernel.

    Inputs are flat (N, ...) with N a multiple of _Q (pad with
    valid_in=False rows). Per-tile partials are summed on the XLA side
    (G ~ 17 tiles at 34k queries — negligible)."""
    from jax.experimental import pallas as pl

    N = d_raw.shape[0]
    assert N % _Q == 0, N
    G = N // _Q
    out = pl.pallas_call(
        _gn_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((_Q, 8), lambda g: (g, 0)),
            pl.BlockSpec((_Q, 8), lambda g: (g, 0)),
            pl.BlockSpec((_Q, 3), lambda g: (g, 0)),
            pl.BlockSpec((_Q, 3), lambda g: (g, 0)),
            pl.BlockSpec((1, 3), lambda g: (0, 0)),
            pl.BlockSpec((8, 3), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        interpret=interpret,
    )(
        d_raw.astype(jnp.float32),
        (inb & valid_in[:, None]).astype(jnp.float32),
        f.astype(jnp.float32),
        a.astype(jnp.float32),
        scale.reshape(1, 3).astype(jnp.float32),
        jnp.asarray(_OFFSETS_NP, jnp.float32),
    )
    tot = out.sum(axis=0)  # (8, 128) per-tile partials
    return tot[:6, :6], tot[6, :6]


def gather_corner_inputs(Dm, pose, points_cam, *, params):
    """The XLA-side front half shared by both A/B arms: sanitize, project,
    corner-gather. Returns (d_raw, inb, f, a, valid_in, scale) padded to a
    _Q multiple."""
    from tracking_sdf_tpu.grid.grid import world_to_voxel
    from tracking_sdf_tpu.grid.interp import (
        BrickMaskedView, _corner_fetch, _corner_fetch_brick, _corner_indices,
        _in_bounds)

    p = jnp.where(jnp.all(jnp.isfinite(points_cam), -1, keepdims=True),
                  points_cam, 0.0)
    valid_in = jnp.all(jnp.isfinite(points_cam), axis=-1)
    x = jnp.einsum("ij,nj->ni", pose.R, p,
                   precision=jax.lax.Precision.HIGHEST) + pose.t
    uvw = world_to_voxel(params, x)
    valid_in = valid_in & jnp.all((uvw >= 0) & (uvw < params.m), axis=-1)

    base_f = jnp.floor(uvw)
    base = base_f.astype(jnp.int32)
    f = (uvw - base_f).astype(jnp.float32)
    ci, cj, ck = _corner_indices(base)
    shape = ((Dm.m,) * 3 if isinstance(Dm, BrickMaskedView) else Dm.shape)
    inb = _in_bounds(ci, cj, ck, shape)
    d_raw = (_corner_fetch_brick(Dm, base)
             if isinstance(Dm, BrickMaskedView) else _corner_fetch(Dm, base))
    scale = jnp.asarray(
        [params.m / params.width, params.m / params.height,
         params.m / params.depth], jnp.float32)

    N = d_raw.shape[0]
    pad = (-N) % _Q
    if pad:
        z = lambda arr: jnp.pad(arr, [(0, pad)] + [(0, 0)] * (arr.ndim - 1))
        d_raw, inb, f = z(d_raw), z(inb), z(f)
        a = z(x - pose.t)
        valid_in = z(valid_in)
    else:
        a = x - pose.t
    return d_raw, inb, f, a, valid_in, scale


def gn_reduce_xla(d_raw, inb, f, a, valid_in, scale):
    """XLA reference arm: identical math, identical inputs."""
    value, grad, ok = trilinear_from_corners(d_raw, inb, f, jnp.float32)
    g_world = grad * scale
    J = jnp.concatenate([g_world, jnp.cross(a, g_world)], axis=-1)
    m = valid_in & ok
    Jm = jnp.where(m[:, None], J, 0.0)
    rm = jnp.where(m, value, 0.0)
    A = jnp.einsum("ni,nj->ij", Jm, Jm,
                   precision=jax.lax.Precision.HIGHEST)
    b = jnp.einsum("ni,n->i", Jm, rm,
                   precision=jax.lax.Precision.HIGHEST)
    return A, b
