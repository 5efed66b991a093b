"""Coarse-grained Pallas slab-gather interpolation (production).

The TPU-native answer to the reference's hot loop — per-parcel 8-point
met interpolation (intpol_met_space_3d, /root/reference/src/mptrac.c:2985)
with spatial sorting for locality (module_sort, c:5699).  XLA's TPU
gather is a serial per-offset row copy (~8-10 ns/offset measured on
v5e); this kernel instead streams the packed corner table through VMEM
in slabs and serves each 128-parcel group of (approximately) sorted
parcels with 128-lane vector gathers:

- Tables are stored transposed: ``packT [64, ncellp]`` — lane = grid
  cell, sublane = corner*6 + component (+ 16 temperature lanes); and
  ``sfcT [128, nxyp]`` — sublane = (corner*2+snap)*16 + field for the
  16 hot 2-D surface fields.
- Grid = one step per chunk of G*128 parcels.  Each step DMAs one
  ``[rows, S]`` slab into VMEM (start = chunk's minimum cell window)
  and serves every group with two 128-cell *window pairs*: one at the
  group's min cell, one at its max.  For sorted parcels a group spans
  only a few cells, so the pairs coincide; parcels whose RK midpoint
  crossed a longitude cell (+-ny*npl in flat index) are caught by the
  max-pair.  Gathers are ``take_along_axis`` along lanes — the one
  dynamic-indexing primitive the VPU has.
- Parcels missing all four windows are flagged and recomputed by a
  bounded XLA fallback gather (cap ~ n/64); the served fraction is
  returned for driver diagnostics.

Measured on TPU v5e (perf/probe.py): 1.16 ns/parcel/site vs 9.9 ns
for the XLA row-gather path, numerically identical (same f32
arithmetic order).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mptrac_tpu.types import Met

WIN = 128            # lane-gather width (hardware vreg lanes)
G_DEFAULT = 64       # parcel groups per grid step (chunk = G*128)
CHUNK = 2 ** 21      # parcels per outer lax.map slice (SMEM budget)

#: 2-D fields packed by build_sfcT, in field-lane order (matches
#: ops.fast_interp.SFC_FIELDS so consumers can share name lookups)
SFC_FIELDS = ("ps", "pbl", "ts", "zs", "cape", "cin", "pel", "plcl",
              "ess", "nss", "shf", "sst", "pt", "tt", "zt", "h2ot")


class SlabTables(NamedTuple):
    """Transposed gather tables for one met snapshot pair."""
    packT: Optional[jnp.ndarray] = None   # [64, ncellp] winds+T
    sfcT: Optional[jnp.ndarray] = None    # [128, nxyp] surface fields


# ------------------------------------------------------------ builders

def build_packT(met01: Met) -> jnp.ndarray:
    """[64, ncellp] transposed corner table, built directly in
    component-major order (no [ncell, 64] intermediate).

    Sublane = corner*6 + comp with corner order (dx,dy,dz) =
    (0,0,0),(0,0,1),...,(1,1,1) and comp order (u0,v0,w0,u1,v1,w1);
    sublanes 48-63 hold temperature (t0,t1) at the same corners.
    Identical lane semantics to ops.fast_interp.build_advect_pack64.
    """
    u = met01.fields3d["u"]      # [2, nx, ny, npl] f32
    v = met01.fields3d["v"]
    w = met01.fields3d["w"]
    t = met01.fields3d.get("t")
    nx, ny, npl = u.shape[-3:]
    n = nx * ny * npl
    ncellp = -(-n // 1024) * 1024

    def edge(f):
        return jnp.pad(f, ((0, 0), (0, 1), (0, 1), (0, 1)),
                       mode="edge")

    ue, ve, we = edge(u), edge(v), edge(w)
    te = edge(t) if t is not None else None
    rows = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                for s in (0, 1):
                    for f in (ue, ve, we):
                        rows.append(f[s, dx:dx + nx, dy:dy + ny,
                                      dz:dz + npl].reshape(n))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                for s in (0, 1):
                    rows.append(
                        te[s, dx:dx + nx, dy:dy + ny,
                           dz:dz + npl].reshape(n)
                        if te is not None else jnp.zeros(n, u.dtype))
    packT = jnp.stack(rows).astype(jnp.float32)
    if ncellp != n:
        packT = jnp.pad(packT, ((0, 0), (0, ncellp - n)))
    return packT


def build_sfcT(met01: Met) -> jnp.ndarray:
    """[128, nxyp] transposed surface table: sublane =
    ((dx*2+dy)*2 + snap)*16 + field, lane = ix*ny + iy (edge-clamped
    corners like build_packT)."""
    f0 = met01.fields2d[SFC_FIELDS[0]]
    nx, ny = f0.shape[-2:]
    nxy = nx * ny
    nxyp = -(-nxy // 1024) * 1024
    rows = []
    for dx in (0, 1):
        for dy in (0, 1):
            for s in (0, 1):
                for name in SFC_FIELDS:
                    f2 = met01.fields2d[name]
                    fe = jnp.pad(f2, ((0, 0), (0, 1), (0, 1)),
                                 mode="edge")
                    rows.append(fe[s, dx:dx + nx,
                                   dy:dy + ny].reshape(nxy))
    sfcT = jnp.stack(rows).astype(jnp.float32)
    if nxyp != nxy:
        sfcT = jnp.pad(sfcT, ((0, 0), (0, nxyp - nxy)))
    return sfcT


def build_slab_tables(met01: Met, wind: bool = True,
                      sfc: bool = True) -> SlabTables:
    return SlabTables(
        packT=build_packT(met01) if wind else None,
        sfcT=build_sfcT(met01) if sfc else None)


# ----------------------------------------------------- kernel internals

def _trilerp_T(rows, wx, wy, wz, wt):
    """Trilinear + time interpolation in transposed layout.

    rows [64, W]; weights [1, W].  Returns (uvw [3, W], t [1, W]) with
    the exact f32 arithmetic order of fast_interp.interp_uvw_packed64.
    """
    def cs(i):
        return rows[i * 6:(i + 1) * 6, :]
    a00 = wz * (cs(0) - cs(1)) + cs(1)
    a01 = wz * (cs(2) - cs(3)) + cs(3)
    a10 = wz * (cs(4) - cs(5)) + cs(5)
    a11 = wz * (cs(6) - cs(7)) + cs(7)
    a0 = wy * (a00 - a01) + a01
    a1 = wy * (a10 - a11) + a11
    vals = wx * (a0 - a1) + a1                         # [6, W]
    uvw = wt * (vals[0:3, :] - vals[3:6, :]) + vals[3:6, :]

    def ts(i):
        return rows[48 + 2 * i:50 + 2 * i, :]
    b00 = wz * (ts(0) - ts(1)) + ts(1)
    b01 = wz * (ts(2) - ts(3)) + ts(3)
    b10 = wz * (ts(4) - ts(5)) + ts(5)
    b11 = wz * (ts(6) - ts(7)) + ts(7)
    b0 = wy * (b00 - b01) + b01
    b1 = wy * (b10 - b11) + b11
    tv = wx * (b0 - b1) + b1                           # [2, W]
    tt = wt * (tv[0:1, :] - tv[1:2, :]) + tv[1:2, :]
    return uvw, tt


def _meso_sigma_T(rows):
    """16-point subgrid wind sigma in transposed layout (reference
    module_diff_meso 2x2x2x2 stencil, c:4280-4304).  rows [64, W] with
    the build_packT sublane order: corner-major, per corner
    (u0,v0,w0,u1,v1,w1)."""
    sigs = []
    for comp in range(3):
        mean = jnp.zeros_like(rows[0:1, :])
        msq = jnp.zeros_like(rows[0:1, :])
        for c in range(8):
            for s in (0, 1):
                val = rows[c * 6 + s * 3 + comp:c * 6 + s * 3 + comp + 1, :]
                mean = mean + val
                msq = msq + val * val
        mean = mean * jnp.float32(1.0 / 16.0)
        msq = msq * jnp.float32(1.0 / 16.0)
        var = msq - mean * mean
        sigs.append(jnp.where(var > 0,
                              jnp.sqrt(jnp.maximum(var, 0.0)), 0.0))
    return jnp.concatenate(sigs, axis=0)               # [3, W]


def _sfc_interp_T(rows, wx, wy, wt):
    """Time + bilinear surface interpolation in transposed layout with
    the non-finite nearest-neighbour / single-snapshot fallbacks of
    fast_interp.interp_sfc_packed (reference c:3084-3166).

    rows [128, W] (build_sfcT layout); returns [16, W]."""
    def blk(dx, dy, s):
        cs = (dx * 2 + dy) * 2 + s
        return rows[cs * 16:(cs + 1) * 16, :]          # [16, W]

    def snap(s):
        a00 = blk(0, 0, s)
        a01 = blk(0, 1, s)
        a10 = blk(1, 0, s)
        a11 = blk(1, 1, s)
        ok = (jnp.isfinite(a00) & jnp.isfinite(a01)
              & jnp.isfinite(a10) & jnp.isfinite(a11))
        aux0 = wy * (a00 - a01) + a01
        aux1 = wy * (a10 - a11) + a11
        bilin = wx * (aux0 - aux1) + aux1
        nn = jnp.where(wy < 0.5,
                       jnp.where(wx < 0.5, a11, a01),
                       jnp.where(wx < 0.5, a10, a00))
        return jnp.where(ok, bilin, nn)

    v0, v1 = snap(0), snap(1)
    both = jnp.isfinite(v0) & jnp.isfinite(v1)
    return jnp.where(both, wt * (v0 - v1) + v1,
                     jnp.where(wt < 0.5, v1, v0))


def _out_rows(mode: str) -> int:
    return {"uvwt": 8, "meso": 8, "sfc": 24}[mode]


def _tab_rows(mode: str) -> int:
    return 128 if mode == "sfc" else 64


def _kernel(s_ref, kmin_ref, kmax_ref, base_ref, w_ref, tab_hbm,
            out_ref, slab, sem, *, G, S, mode):
    """One grid step: DMA slab [R, S] at window s_ref[c], then serve G
    groups of 128 parcels with two window pairs each."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = _tab_rows(mode)
    with jax.enable_x64(False):
        c = pl.program_id(0)
        start = s_ref[c] * WIN
        cp = pltpu.make_async_copy(tab_hbm.at[:, pl.ds(start, S)],
                                   slab, sem)
        cp.start()
        cp.wait()
        nwin = S // WIN
        for g in range(G):
            idx = base_ref[g:g + 1, :] - start         # [1, 128]
            k0 = kmin_ref[c * G + g] - s_ref[c]
            k0 = jnp.minimum(jnp.maximum(k0, jnp.int32(0)),
                             jnp.int32(nwin - 2))
            k1 = kmax_ref[c * G + g] - s_ref[c]
            k1 = jnp.minimum(jnp.maximum(k1, jnp.int32(0)),
                             jnp.int32(nwin - 2))

            def pair(koff):
                off = koff * WIN
                w0 = slab[:, pl.ds(off, WIN)]
                w1 = slab[:, pl.ds(off + WIN, WIN)]
                i0 = idx - off
                in0 = (i0 >= 0) & (i0 < WIN)
                in1 = (i0 >= WIN) & (i0 < 2 * WIN)
                g0 = jnp.take_along_axis(
                    w0, jnp.broadcast_to(jnp.where(in0, i0, 0),
                                         (R, WIN)), axis=1)
                g1 = jnp.take_along_axis(
                    w1, jnp.broadcast_to(jnp.where(in1, i0 - WIN, 0),
                                         (R, WIN)), axis=1)
                return (jnp.where(in0, g0, jnp.where(in1, g1, 0.0)),
                        in0 | in1)

            rows_a, ok_a = pair(k0)
            rows_b, ok_b = pair(k1)
            rows = jnp.where(ok_a, rows_a, rows_b)
            ok = ok_a | ok_b
            okf = ok.astype(jnp.float32)

            ws = w_ref[:, g * WIN:(g + 1) * WIN]
            if mode == "uvwt":
                uvw, tt = _trilerp_T(rows, ws[0:1], ws[1:2], ws[2:3],
                                     ws[3:4])
                contrib = jnp.concatenate(
                    [uvw, tt, okf,
                     jnp.zeros((3, WIN), jnp.float32)], axis=0)
            elif mode == "meso":
                sig = _meso_sigma_T(rows)
                contrib = jnp.concatenate(
                    [sig, okf,
                     jnp.zeros((4, WIN), jnp.float32)], axis=0)
            else:                                      # sfc
                vals = _sfc_interp_T(rows, ws[0:1], ws[1:2], ws[2:3])
                contrib = jnp.concatenate(
                    [vals, okf,
                     jnp.zeros((7, WIN), jnp.float32)], axis=0)
            out_ref[:, g * WIN:(g + 1) * WIN] = contrib * okf


def _pick_S(ncellp: int, n: int, G: int) -> int:
    """Slab cells per grid step: ~1.5x the expected sorted span of a
    G*128-parcel chunk, in [1024, 8192], capped by the table."""
    span = G * WIN * max(1.0, ncellp / max(n, 1))
    S = int(min(8192, max(1024, 1.5 * span)))
    S = -(-S // 1024) * 1024
    return min(S, ncellp)


@functools.partial(jax.jit,
                   static_argnames=("G", "S", "mode", "interpret"))
def _slab_call(tab, base, w, G, S, mode, interpret=False):
    """Pallas dispatch over <=CHUNK parcels (prefetched scalar arrays
    must stay small for SMEM)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = base.shape[0]
    CP = G * WIN
    nchunk = -(-n // CP)
    npad = nchunk * CP
    nblk = tab.shape[1] // WIN
    OR = _out_rows(mode)

    base_p = jnp.pad(base, (0, npad - n), mode="edge")
    w_p = jnp.pad(w, ((0, 0), (0, npad - n)))
    bmat = base_p.reshape(nchunk, G, WIN)
    kmin = (jnp.min(bmat, axis=2) // WIN).astype(jnp.int32)
    kmax = (jnp.maximum(jnp.max(bmat, axis=2) - (WIN - 1), 0)
            // WIN).astype(jnp.int32)
    s = jnp.clip(jnp.min(kmin, axis=1), 0,
                 nblk - S // WIN).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((G, WIN), lambda c, *_: (c, c * 0)),
            pl.BlockSpec((4, CP), lambda c, *_: (c * 0, c)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((OR, CP), lambda c, *_: (c * 0, c)),
        scratch_shapes=[
            pltpu.VMEM((_tab_rows(mode), S), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, G=G, S=S, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OR, npad), jnp.float32),
        interpret=interpret,
    )(s, kmin.reshape(-1), kmax.reshape(-1),
      bmat.reshape(nchunk * G, WIN), w_p.reshape(4, npad), tab)
    return out[:, :n]


def _slab_call_outer(tab, base, w, G, S, mode, interpret=False):
    """lax.map over <=CHUNK-parcel slices."""
    n = base.shape[0]
    if n <= CHUNK:
        return _slab_call(tab, base, w, G, S, mode, interpret)
    nch = -(-n // CHUNK)
    pad = nch * CHUNK - n
    base_p = jnp.pad(base, (0, pad), mode="edge").reshape(nch, CHUNK)
    w_p = jnp.moveaxis(
        jnp.pad(w, ((0, 0), (0, pad))).reshape(4, nch, CHUNK), 1, 0)
    out = jax.lax.map(
        lambda bw: _slab_call(tab, bw[0], bw[1], G, S, mode,
                              interpret),
        (base_p, w_p))
    OR = _out_rows(mode)
    return jnp.moveaxis(out, 0, 1).reshape(OR, nch * CHUNK)[:, :n]


# ------------------------------------------------------ fallback path

def _fallback_cols(tab, base, idx_bad):
    """Columns of the transposed table for straggler parcels:
    [R, cap] via an XLA gather (bounded by the fallback cap)."""
    cols = jnp.take(base, idx_bad, fill_value=0)
    return jnp.take(tab, cols, axis=1)


def _apply_fallback(tab, base, w, out, mode, cap):
    """Recompute parcels the kernel could not serve (ok row == 0)."""
    n = base.shape[0]
    OR = _out_rows(mode)
    okrow = {"uvwt": 4, "meso": 3, "sfc": 16}[mode]
    ok = out[okrow, :] > 0.5
    idx_bad = jnp.nonzero(~ok, size=cap, fill_value=n)[0]
    rows = _fallback_cols(tab, base, jnp.minimum(idx_bad, n - 1))
    w_bad = jnp.take(w, jnp.minimum(idx_bad, n - 1), axis=1)
    if mode == "uvwt":
        uvw, tt = _trilerp_T(rows, w_bad[0:1], w_bad[1:2], w_bad[2:3],
                             w_bad[3:4])
        vals = jnp.concatenate([uvw, tt], axis=0)      # [4, cap]
    elif mode == "meso":
        vals = _meso_sigma_T(rows)                     # [3, cap]
    else:
        vals = _sfc_interp_T(rows, w_bad[0:1], w_bad[1:2],
                             w_bad[2:3])               # [16, cap]
    nv = vals.shape[0]
    out_v = jnp.concatenate(
        [out[:nv, :], jnp.zeros((nv, 1), out.dtype)], axis=1)
    out_v = out_v.at[:, idx_bad].set(vals, mode="drop")
    served = jnp.mean(ok.astype(jnp.float32))
    return out_v[:, :n], served


# ------------------------------------------------------------- public

def interp_uvwt(tables: SlabTables, base, weights, G: int = G_DEFAULT,
                cap_frac: int = 64, interpret: bool = False):
    """(u, v, w) winds + temperature for ~sorted parcels.

    base [n] int32 flat cell (ix*ny+iy)*npl+iz; weights [4, n] f32
    (wx, wy, wz, wt).  Returns (uvw [4, n] f32, served fraction)."""
    n = base.shape[0]
    S = _pick_S(tables.packT.shape[1], min(n, CHUNK), G)
    out = _slab_call_outer(tables.packT, base, weights, G, S, "uvwt",
                           interpret)
    cap = max(WIN, n // cap_frac)
    return _apply_fallback(tables.packT, base, weights, out, "uvwt",
                           cap)


def meso_sigma(tables: SlabTables, base, G: int = G_DEFAULT,
               cap_frac: int = 64, interpret: bool = False):
    """Subgrid wind sigma (u, v, w) for ~sorted parcels: [3, n] f32."""
    n = base.shape[0]
    S = _pick_S(tables.packT.shape[1], min(n, CHUNK), G)
    w = jnp.zeros((4, n), jnp.float32)
    out = _slab_call_outer(tables.packT, base, w, G, S, "meso",
                           interpret)
    cap = max(WIN, n // cap_frac)
    return _apply_fallback(tables.packT, base, w, out, "meso", cap)


def interp_sfc(tables: SlabTables, basexy, weights,
               G: int = G_DEFAULT, cap_frac: int = 64,
               interpret: bool = False):
    """All 16 packed surface fields for ~sorted parcels.

    basexy [n] int32 = ix*ny+iy; weights [4, n] f32 (wx, wy, wt, 0).
    Returns ([16, n] f32 in SFC_FIELDS order, served fraction)."""
    n = basexy.shape[0]
    S = _pick_S(tables.sfcT.shape[1], min(n, CHUNK), G)
    out = _slab_call_outer(tables.sfcT, basexy, weights, G, S, "sfc",
                           interpret)
    cap = max(WIN, n // cap_frac)
    return _apply_fallback(tables.sfcT, basexy, weights, out, "sfc",
                           cap)
