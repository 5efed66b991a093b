"""Pallas TPU kernel: fused wind interpolation for sorted parcels.

The hot loop gathers 8 corner rows of the packed wind table per parcel
(ops.fast_interp).  XLA's gather streams rows from HBM individually;
this kernel exploits the spatial sort (ops.sort / reference
module_sort, c:5699) instead: parcels in a block touch a *contiguous*
range of grid cells, so one DMA brings a slab of the packed table into
VMEM and all corner reads become VMEM-local.  The slab must cover the
block's cell span plus one lon/lat/level stride (ny*npl + npl + 1
rows); for ERA5 0.25-degree grids that is ~3 MB — well within VMEM.

Layout: pack [ncell, 8] f32 rows (u0 v0 w0 u1 v1 w1 0 0), lane-aligned.
Each grid step processes BLOCK parcels with scalar-prefetched slab
offsets; out-of-slab parcels (badly sorted stragglers) are detected and
their indices clamped — callers re-run stragglers on the XLA path.

Falls back transparently to the XLA gather path when Pallas/TPU is not
available (interpret mode covers CPU testing).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 512          # parcels per grid step
LANES = 8            # packed row width


def _kernel(slab_off_ref, base_ref, w_ref, pack_ref, out_ref, ok_ref,
            slab_ref, sem):
    """One block: DMA slab, interpolate BLOCK parcels.

    slab_off_ref: [nblk] scalar-prefetch slab start rows
    base_ref:     [BLOCK] cell row of each parcel's (ix, iy, iz) corner
    w_ref:        [BLOCK, 8] weights (wx, wy, wz, wt, ox, oy, pad, pad)
    pack_ref:     [ncell, 8] full table in HBM (ANY)
    out_ref:      [BLOCK, 8] interpolated (u, v, w, pad...)
    ok_ref:       [BLOCK, 8] 1.0 where the slab covered the parcel
    slab_ref:     [SLAB, 8] VMEM scratch
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    slab0 = slab_off_ref[i]
    slab_rows = slab_ref.shape[0]

    copy = pltpu.make_async_copy(
        pack_ref.at[pl.ds(slab0, slab_rows)], slab_ref, sem)
    copy.start()
    copy.wait()

    base = base_ref[...] - slab0                     # local rows
    wx = w_ref[:, 0:1]
    wy = w_ref[:, 1:2]
    wz = w_ref[:, 2:3]
    wt = w_ref[:, 3:4]
    oy = w_ref[:, 4:5].astype(jnp.int32)[:, 0]       # npl stride
    ox = w_ref[:, 5:6].astype(jnp.int32)[:, 0]       # ny*npl stride

    maxoff = base + ox + oy + 1
    ok = (base >= 0) & (maxoff < slab_rows)
    safe = jnp.where(ok, base, 0)

    def corner(dx, dy, dz):
        idx = safe + dx * ox + dy * oy + dz
        return slab_ref[idx, :]

    c000 = corner(0, 0, 0)
    c001 = corner(0, 0, 1)
    c010 = corner(0, 1, 0)
    c011 = corner(0, 1, 1)
    c100 = corner(1, 0, 0)
    c101 = corner(1, 0, 1)
    c110 = corner(1, 1, 0)
    c111 = corner(1, 1, 1)

    a00 = wz * (c000 - c001) + c001
    a01 = wz * (c010 - c011) + c011
    a10 = wz * (c100 - c101) + c101
    a11 = wz * (c110 - c111) + c111
    a0 = wy * (a00 - a01) + a01
    a1 = wy * (a10 - a11) + a11
    vals = wx * (a0 - a1) + a1                       # [BLOCK, 8]

    # time lerp between (u0,v0,w0) and (u1,v1,w1) -> first 3 lanes
    v0 = vals[:, 0:4]
    v1f = jnp.concatenate([vals[:, 3:6], vals[:, 6:7]], axis=1)
    out = wt * (v0 - v1f) + v1f
    out_ref[:, 0:4] = out
    out_ref[:, 4:8] = jnp.zeros_like(out)
    ok_ref[...] = jnp.broadcast_to(
        ok.astype(jnp.float32)[:, None], ok_ref.shape)


def interp_uvw_sorted(pack, base, weights, strides: Tuple[int, int],
                      slab_rows: int = 32768, interpret: bool = False):
    """Interpolate (u, v, w) for sorted parcels with the slab kernel.

    pack:     [ncell, 8] f32 packed wind table
    base:     [np] int32 flat cell row of the lower corner
    weights:  [np, 4] f32 (wx, wy, wz, wt)
    strides:  (ox, oy) = (ny*npl, npl)
    Returns (uvw [np, 3] f32, ok [np] bool).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = base.shape[0]
    nblk = -(-n // BLOCK)
    npad = nblk * BLOCK
    base_p = jnp.pad(base, (0, npad - n))
    w_p = jnp.pad(weights.astype(jnp.float32),
                  ((0, npad - n), (0, 0)))
    ox, oy = strides
    wfull = jnp.concatenate([
        w_p,
        jnp.full((npad, 1), float(oy), jnp.float32),
        jnp.full((npad, 1), float(ox), jnp.float32),
        jnp.zeros((npad, 2), jnp.float32)], axis=1)

    # Per-block slab offsets: min base in the block (host of XLA side),
    # aligned down to the sublane tile
    base_blocks = base_p.reshape(nblk, BLOCK)
    slab_off = jnp.min(base_blocks, axis=1)
    slab_off = jnp.maximum(slab_off - (slab_off % 8), 0)
    ncell = pack.shape[0]
    slab_off = jnp.minimum(slab_off,
                           jnp.maximum(ncell - slab_rows, 0))
    slab_off = slab_off.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i, s: (i,)),
            pl.BlockSpec((BLOCK, LANES), lambda i, s: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, LANES), lambda i, s: (i, 0)),
            pl.BlockSpec((BLOCK, LANES), lambda i, s: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, okf = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((npad, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(slab_off, base_p, wfull, pack)
    return out[:n, :3], okf[:n, 0] > 0.5
