"""Coarse-grained Pallas slab-gather interpolation (production).

The TPU-native answer to the reference's hot loop — per-parcel 8-point
met interpolation (intpol_met_space_3d, /root/reference/src/mptrac.c:2985)
with spatial sorting for locality (module_sort, c:5699).  XLA's TPU
gather is a serial per-offset row copy (~8-10 ns/offset measured on
v5e); this kernel instead keeps a large slab of the packed corner
table resident in VMEM and serves each 128-parcel group of sorted
parcels with 128-lane vector gathers:

- Tables are stored transposed: ``packT [64, ncellp]`` — lane = grid
  cell, sublane = corner*6 + component (+ 16 temperature lanes); and
  ``sfcT [128, nxyp]`` — sublane = (corner*2+snap)*16 + field for the
  16 hot 2-D surface fields.
- Grid = (chunk, group-block).  At the first group-block of a chunk
  the kernel DMAs one ``[rows, S]`` slab into scratch VMEM (persistent
  across grid steps); S covers the chunk's sorted span *plus a full
  +-1-longitude-cell margin* (+-ny*npl cells), so parcels whose RK
  midpoint or drift since the last sort crossed a longitude cell are
  still served in-kernel.
- Each 128-parcel group is served by three 256-cell *window pairs*
  anchored at the group's min, median and max cell: the bulk of a
  sorted group spans only a few cells at production density
  (~25 parcels/cell at the 100M-parcel flagship), and
  longitude-crossers form at most two extra clusters at +-ny*npl —
  three anchors cover all of them.  Gathers are ``take_along_axis``
  along lanes — the one dynamic-indexing primitive the VPU has.
- Two in-kernel refinement passes re-anchor on the min/max
  still-unserved cell, catching small interior clusters (RK midpoints
  that crossed both a lon and a lat cell).  The rare residue is
  flagged and recomputed by a bounded XLA fallback: group-level top_k
  compaction + one row gather per straggler from the row-major
  ``pack64`` mirror.

Measured on TPU v5e (perf/probe.py): ~1.2-2 ns/parcel/site vs 9.9 ns
for the XLA row-gather path, numerically identical (same f32
arithmetic order).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mptrac_tpu.types import Met

WIN = 128            # lane-gather width (hardware vreg lanes)

#: absolute fallback-repair cap: the exact-recompute buffers scale
#: as [128, cap] (surface rows) / [64, cap] (corner rows); an
#: n/32-proportional cap allocates ~3 GB at 100M parcels and was the
#: last HBM OOM.  1M repairs >= 2x the worst unserved fraction the
#: driver's served_min re-sort threshold (0.995) permits at 100M;
#: beyond it the served fraction reports the shortfall and the driver
#: re-sorts or aborts.
CAP_MAX = 1 << 20
U = 8                # groups unrolled per grid step (1024 parcels)
CHUNK = 2 ** 21      # parcels per outer lax.map slice (SMEM budget)
SPAN_BULK = 6144     # slab cells budgeted for the chunk's sorted span

#: 2-D fields packed by build_sfcT, in field-lane order (matches
#: ops.fast_interp.SFC_FIELDS so consumers can share name lookups)
SFC_FIELDS = ("ps", "pbl", "ts", "zs", "cape", "cin", "pel", "plcl",
              "ess", "nss", "shf", "sst", "pt", "tt", "zt", "h2ot")


class SlabTables(NamedTuple):
    """Gather tables for one met snapshot pair."""
    packT: Optional[jnp.ndarray] = None   # [64, ncellp] winds+T (T)
    sfcT: Optional[jnp.ndarray] = None    # [128, nxyp] surface (T)
    pack64: Optional[jnp.ndarray] = None  # [ncellp, 64] row-major
    #   mirror of packT for the straggler fallback (one gather offset
    #   serves a parcel's whole corner block)


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
    # cyclic wrap margins: [copies of the last 2 cyclic lon columns |
    # main | copies of the first 2 past the seam], so
    # dateline-crossing parcels can be served in-slab after cyclic
    # index unwrapping (_slab_call).  On grids with a duplicated
    # wraparound column (lon_periodic) the cyclic period is nx-1
    # columns: the column past ix = nx-1 (== ix 0) is ix 1.
    ox = ny * npl
    packT = jnp.concatenate(
        [_wrap_w(packT, n, ox, met01.lon_periodic), packT,
         _wrap_e(packT, ox, met01.lon_periodic)], axis=1)
    ntot = n + 4 * ox
    ncellp = -(-ntot // 1024) * 1024
    if ncellp != ntot:
        packT = jnp.pad(packT, ((0, 0), (0, ncellp - ntot)))
    return packT


def _wrap_w(tab, n, ox, periodic: bool):
    """West margin: the 2 columns cyclically preceding column 0."""
    if periodic:                      # ... nx-3, nx-2 | 0 (== nx-1)
        return tab[:, n - 3 * ox:n - ox]
    return tab[:, n - 2 * ox:n]


def _wrap_e(tab, ox, periodic: bool):
    """East margin: the 2 columns cyclically following the last."""
    if periodic:                      # nx-1 (== 0) | 1, 2 ...
        return tab[:, ox:3 * ox]
    return tab[:, :2 * ox]


def build_pack64(packT: jnp.ndarray) -> jnp.ndarray:
    """Row-major transpose of packT for the straggler fallback: one
    gather offset per straggler serves the whole corner block (XLA
    gather cost is per offset, row width <= 128 lanes is free)."""
    return packT.T


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
    sfcT = jnp.concatenate(
        [_wrap_w(sfcT, nxy, ny, met01.lon_periodic), sfcT,
         _wrap_e(sfcT, ny, met01.lon_periodic)], axis=1)
    ntot = nxy + 4 * ny
    nxyp = -(-ntot // 1024) * 1024
    if nxyp != ntot:
        sfcT = jnp.pad(sfcT, ((0, 0), (0, nxyp - ntot)))
    return sfcT


def build_slab_tables(met01: Met, wind: bool = True,
                      sfc: bool = True) -> SlabTables:
    packT = build_packT(met01) if wind else None
    return SlabTables(
        packT=packT,
        sfcT=build_sfcT(met01) if sfc else None,
        pack64=build_pack64(packT) if wind else None)


# ----------------------------------------------------- interpolants

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
                l = c * 6 + s * 3 + comp
                val = rows[l:l + 1, :]
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


def _out_rows(mode) -> int:
    """Output sublane count: payload rows + ok flag, padded to 8."""
    nv = _val_rows(mode)
    return -(-(nv + 1) // 8) * 8


def _val_rows(mode) -> int:
    if isinstance(mode, tuple):                        # ("sfc", fields)
        return len(mode[1])
    return {"uvwt": 4, "meso": 3, "gather8": 8}[mode]


def _tab_rows(mode) -> int:
    if isinstance(mode, tuple):
        return 128
    return 8 if mode == "gather8" else 64


# ------------------------------------------------------------- kernel

def _kernel(s_ref, anc_ref, base_ref, w_ref, tab_hbm, out_ref, slab,
            sem, *, GB, S, mode, nanc):
    """Grid (nchunk, GB): step (c, 0) DMAs the chunk slab; every step
    serves U groups of 128 parcels, each with nanc anchor window
    pairs."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = _tab_rows(mode)
    OR = _out_rows(mode)
    nv = _val_rows(mode)
    with jax.enable_x64(False):
        c = pl.program_id(0)
        g = pl.program_id(1)
        start = s_ref[c] * WIN

        @pl.when(g == 0)
        def _():
            cp = pltpu.make_async_copy(
                tab_hbm.at[:, pl.ds(start, S)], slab, sem)
            cp.start()
            cp.wait()

        nwin = S // WIN
        for u in range(U):
            gi = ((c * GB) + g) * U + u
            idx = base_ref[u:u + 1, :] - start         # [1, 128]

            def pair(anc):
                k = jnp.minimum(jnp.maximum(anc - s_ref[c],
                                            jnp.int32(0)),
                                jnp.int32(nwin - 2))
                off = k * WIN
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

            rows, ok = pair(anc_ref[nanc * gi])
            for a in range(1, nanc):
                r2, ok2 = pair(anc_ref[nanc * gi + a])
                rows = jnp.where(ok, rows, r2)
                ok = ok | ok2
            # two adaptive refinement passes: re-anchor on the min /
            # max still-unserved cell of the group.  The static
            # anchors catch the bulk and the extreme drift clusters;
            # these catch small interior clusters (e.g. parcels whose
            # RK midpoint crossed both a lon and a lat cell), keeping
            # the XLA fallback rare.
            for lo in (True, False):
                if lo:
                    m = jnp.min(jnp.where(ok, jnp.int32(2 ** 30),
                                          idx))
                    kref = m // WIN
                else:
                    m = jnp.max(jnp.where(ok, jnp.int32(-2 ** 30),
                                          idx))
                    kref = jnp.maximum(m - (WIN - 1), 0) // WIN
                r2, ok2 = pair(kref + s_ref[c])
                rows = jnp.where(ok, rows, r2)
                ok = ok | ok2
            okf = ok.astype(jnp.float32)

            ws = w_ref[:, u * WIN:(u + 1) * WIN]
            if mode == "uvwt":
                uvw, tt = _trilerp_T(rows, ws[0:1], ws[1:2], ws[2:3],
                                     ws[3:4])
                vals = jnp.concatenate([uvw, tt], axis=0)
            elif mode == "gather8":
                vals = rows                            # pure permute
            elif mode == "meso":
                vals = _meso_sigma_T(rows)
            else:                                      # ("sfc", fields)
                v16 = _sfc_interp_T(rows, ws[0:1], ws[1:2], ws[2:3])
                vals = jnp.concatenate(
                    [v16[f:f + 1, :] for f in mode[1]], axis=0)
            contrib = jnp.concatenate(
                [vals, okf,
                 jnp.zeros((OR - nv - 1, WIN), jnp.float32)], axis=0)
            out_ref[:, u * WIN:(u + 1) * WIN] = contrib * okf


def _plan(ncellp: int, n: int, margin: int):
    """(CP, S, nanc): parcels per chunk, slab cells, anchors/group.

    CP is sized so a sorted chunk spans <= SPAN_BULK cells; S adds the
    +-margin (one longitude cell in flat-index units) plus anchor
    slack.  Everything static at trace time."""
    density = n / max(ncellp, 1)
    CP = 1 << max(10, min(17, int(density * SPAN_BULK * 0.8)
                          .bit_length() - 1))
    CP = min(CP, CHUNK)
    # per-side reach from the chunk reference parcel: the reference
    # can sit at the very bottom (or top) of the chunk's sorted span,
    # and lon-crossers extend a further +-margin beyond it
    S = 2 * (SPAN_BULK + margin + 2 * WIN)
    S = -(-S // 1024) * 1024
    S = min(S, ncellp)
    # three anchors (min/median/max) cover bulk + two straggler
    # clusters (e.g. lat-crossers below the bulk + lon-crossers at
    # +-ny*npl); with two anchors the serving fraction decays ~5x
    # faster between sorts
    nanc = 3
    return CP, S, nanc


@functools.partial(
    jax.jit, static_argnames=("CP", "S", "margin", "mode", "nanc",
                              "ncell", "wrap", "interpret"))
def _slab_call(tab, base, w, CP, S, margin, mode, nanc=3, ncell=None,
               wrap=0, interpret=False):
    """Pallas dispatch over <=CHUNK parcels; returns [OR, npad].

    ``base`` is in main-grid coordinates [0, ncell); the table carries
    ``wrap`` copied cells on each side, and each parcel's index is
    cyclically unwrapped toward its chunk's median so dateline
    crossers stay in-slab."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = base.shape[0]
    nchunk = -(-n // CP)
    npad = nchunk * CP
    GB = CP // (U * WIN)
    nblk = tab.shape[1] // WIN
    OR = _out_rows(mode)

    base_p = jnp.pad(base, (0, npad - n), mode="edge") + wrap
    bmat0 = base_p.reshape(nchunk, -1, WIN)
    ngc = bmat0.shape[1]
    # chunk reference cell: median element of the middle group of the
    # chunk's REAL parcels (an actual median would be skewed by the
    # edge-padding of a mostly-padded final chunk)
    nreal = jnp.clip(n - jnp.arange(nchunk) * CP, 1, CP)
    gmid = jnp.clip(nreal // (2 * WIN), 0, ngc - 1)
    medc = jnp.take_along_axis(bmat0[:, :, WIN // 2], gmid[:, None],
                               axis=1)[:, 0].astype(jnp.int32)
    valid = None
    if ncell is not None and wrap > 0:
        # cyclic unwrap toward the chunk reference cell so dateline
        # crossers land in the wrap-margin copies
        m3 = medc[:, None, None]
        bmat0 = jnp.where(bmat0 - m3 > ncell // 2, bmat0 - ncell,
                          jnp.where(m3 - bmat0 > ncell // 2,
                                    bmat0 + ncell, bmat0))
        # Unwrapped indices beyond the 2-column wrap margins would
        # read the zero-padded table tail (or wild anchors would DMA
        # out of bounds) and could be served zeros with ok=1 (round-4
        # advisor finding): clamp them in-range and force ok=0 below
        # so the exact fallback recomputes them.
        ntot = ncell + 2 * wrap
        valid = (bmat0 >= 0) & (bmat0 < ntot)
        bmat0 = jnp.clip(bmat0, 0, ntot - 1)
    bmat = bmat0
    base_p = bmat.reshape(-1)
    w_p = jnp.pad(w, ((0, 0), (0, npad - n)))
    gmin = jnp.min(bmat, axis=2)
    gmax = jnp.max(bmat, axis=2)
    anc = [gmin // WIN]
    if nanc == 3:
        anc.append(bmat[:, :, WIN // 2] // WIN)
    anc.append(jnp.maximum(gmax - (WIN - 1), 0) // WIN)
    anchors = jnp.stack(anc, axis=-1).astype(jnp.int32)
    # center the slab on the chunk reference cell: between sorts the
    # population drifts coherently (e.g. +1..+2 longitude cells);
    # centering follows the crossed majority so the +-S/2 reach
    # covers both the crossed clusters and the laggards
    s = jnp.clip(medc // WIN - (S // WIN) // 2, 0,
                 nblk - S // WIN).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunk, GB),
        in_specs=[
            pl.BlockSpec((U, WIN),
                         lambda c, g, *_: (c * GB + g, c * 0)),
            pl.BlockSpec((4, U * WIN), lambda c, g, *_: (c * 0,
                                                         c * GB + g)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((OR, U * WIN),
                               lambda c, g, *_: (c * 0, c * GB + g)),
        scratch_shapes=[
            pltpu.VMEM((_tab_rows(mode), S), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, GB=GB, S=S, mode=mode, nanc=nanc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OR, npad), jnp.float32),
        interpret=interpret,
    )(s, anchors.reshape(-1), base_p.reshape(-1, WIN),
      w_p.reshape(4, npad), tab)
    if valid is not None:
        r_ok = _val_rows(mode)
        out = out.at[r_ok].multiply(
            valid.reshape(-1).astype(out.dtype))
    return out


def _w_stack(w):
    """Weights arrive stacked [4, n] or as a tuple of four [n] arrays
    (the tuple form lets the chunked path below slice the originals
    instead of materializing a full-ensemble [4, n] copy)."""
    if isinstance(w, (tuple, list)):
        return jnp.stack(list(w))
    return w


def _slab_out3(tab, base, w, CP, S, margin, mode, nanc=3,
               ncell=None, wrap=0, interpret=False, out_rows=None):
    """Kernel output as [nslice, OR, L] — row-major so per-row
    extraction later is a reshape, not a transposed copy.

    ``out_rows`` bounds the retained output rows per chunk: the kernel
    pads OR to a sublane multiple, and at 100M parcels the unsliced
    [nch, OR, CHUNK] stack alone is ~3 GB (the round-4 100M OOM);
    slicing inside the chunk map keeps only the useful rows live."""
    n = base.shape[0]

    def crop(res):
        return res if out_rows is None else res[:out_rows]

    if n <= CHUNK:
        return crop(_slab_call(tab, base, _w_stack(w), CP, S, margin,
                               mode, nanc, ncell, wrap, interpret))[None]
    nch = -(-n // CHUNK)
    pad = nch * CHUNK - n
    if pad == 0:
        # Zero-copy chunking: slice base and each weight row straight
        # out of the caller's arrays inside the map body — no padded
        # [4, n] stack, no [nch, 4, CHUNK] transpose (both ~1.5 GB at
        # 100M).  The bench driver rounds the ensemble to a CHUNK
        # multiple precisely to stay on this path.
        ws = (tuple(w) if isinstance(w, (tuple, list))
              else tuple(w[i] for i in range(w.shape[0])))

        def body(i):
            i0 = i * CHUNK
            b = jax.lax.dynamic_slice(base, (i0,), (CHUNK,))
            wc = jnp.stack([jax.lax.dynamic_slice(wi, (i0,), (CHUNK,))
                            for wi in ws])
            return crop(_slab_call(tab, b, wc, CP, S, margin, mode,
                                   nanc, ncell, wrap, interpret))

        return jax.lax.map(body, jnp.arange(nch))
    w = _w_stack(w)
    base_p = jnp.pad(base, (0, pad), mode="edge").reshape(nch, CHUNK)
    w_p = jnp.moveaxis(
        jnp.pad(w, ((0, 0), (0, pad))).reshape(4, nch, CHUNK), 1, 0)
    return jax.lax.map(
        lambda bw: crop(_slab_call(tab, bw[0], bw[1], CP, S, margin,
                                   mode, nanc, ncell, wrap, interpret)),
        (base_p, w_p))


def _row(out3, r: int, n: int):
    """[n] view of output row r from the [nslice, OR, L] stack."""
    return out3[:, r, :].reshape(-1)[:n]


# ------------------------------------------------------ fallback path

def _compact_bad(ok, cap):
    """Indices of unserved parcels, bounded by cap, without a
    full-length nonzero/argsort (169 ms / 5 ms at 2M on v5e):
    group-level top_k picks the groups containing stragglers, then a
    small argsort compacts within the candidate window.  Unused slots
    return n (out of bounds -> dropped by scatter mode='drop')."""
    n = ok.shape[0]
    ng = -(-n // WIN)
    bad = ~ok
    badp = jnp.pad(bad, (0, ng * WIN - n))
    grp = jnp.sum(badp.reshape(ng, WIN), axis=1)       # [ng]
    cap_g = max(1, min(ng, cap // 16))
    _, gidx = jax.lax.top_k(grp, cap_g)
    cand = (gidx[:, None] * WIN
            + jnp.arange(WIN, dtype=jnp.int32)).reshape(-1)
    cand_bad = jnp.take(badp, cand)
    order = jnp.argsort(~cand_bad, stable=True)
    idx = jnp.take(cand, order[:cap])
    sel = jnp.take(cand_bad, order[:cap])
    return jnp.where(sel & (idx < n), idx, n)          # n = dropped


def _fb_corner_rows(pack64, base, idx_bad):
    """Straggler fallback gather: [64, cap] in the kernel's transposed
    sublane order — ONE row offset per straggler from the row-major
    pack64 mirror."""
    b = jnp.take(base, jnp.minimum(idx_bad, base.shape[0] - 1))
    return jnp.take(pack64, b, axis=0).T               # [64, cap]


def _fix_with_cap(tables, base, w, ok, mode, cap, oy, ox):
    """One fallback pass at a static cap: compact + gather + values."""
    n = base.shape[0]

    def fix(rows_t):
        idx_bad = _compact_bad(ok, cap)
        sel = jnp.minimum(idx_bad, n - 1)
        if isinstance(w, (tuple, list)):
            w_bad = jnp.stack([jnp.take(wi, sel) for wi in w])
        else:
            w_bad = jnp.take(w, sel, axis=1)
        vals = _fb_values(tables, base, w_bad, idx_bad, mode, oy, ox)
        return tuple(r.at[idx_bad].set(v, mode="drop")
                     for r, v in zip(rows_t, vals))

    return fix


def _fb_values(tables, base, w_bad, idx_bad, mode, oy, ox):
    """Exact per-parcel values for the index list (transposed-layout
    arithmetic identical to the kernel's)."""
    n = base.shape[0]
    if isinstance(mode, tuple):                        # sfc subset
        cols = jnp.take(base, jnp.minimum(idx_bad, n - 1))
        r128 = jnp.take(tables.sfcT, cols, axis=1)
        v16 = _sfc_interp_T(r128, w_bad[0:1], w_bad[1:2], w_bad[2:3])
        return [v16[f] for f in mode[1]]
    r64 = _fb_corner_rows(tables.pack64, base, idx_bad)
    if mode == "uvwt":
        uvw, tt = _trilerp_T(r64, w_bad[0:1], w_bad[1:2], w_bad[2:3],
                             w_bad[3:4])
        return [uvw[0], uvw[1], uvw[2], tt[0]]
    sig = _meso_sigma_T(r64)
    return [sig[0], sig[1], sig[2]]


def _apply_fallback(tables: SlabTables, base, w, rows, ok, mode, cap,
                    oy=None, ox=None):
    """Recompute parcels the kernel could not serve (ok == False).

    rows: tuple of [n] value arrays.  Freshly sorted parcels are all
    served, so the compact + gather machinery hides behind a lax.cond
    on the straggler count.  The cap bounds BOTH the cost and the
    coverage: the driver must re-sort before the unserved fraction
    approaches cap/n (default 1/32; see cache.served_min and the
    adaptive re-sort threshold).  The returned served fraction lets
    the driver detect a missed deadline loudly.

    (Memory note: multiple fallback tiers were tried; the extra
    lax.cond branch temps push a 50M-parcel lax.scan over the HBM
    edge and crash the runtime, so there is exactly one tier.)"""
    n = base.shape[0]
    nbad = jnp.sum((~ok).astype(jnp.int32))
    fix = _fix_with_cap(tables, base, w, ok, mode, cap, oy, ox)
    rows = jax.lax.cond(nbad > 0, fix, lambda r: r, tuple(rows))
    # The returned fraction is the PRE-fix mean(ok): it counts every
    # kernel-unserved parcel, including the ones the capped fallback
    # just repaired, so it strictly over-reports the residual
    # shortfall — the driver's served_min re-sort/abort guard can
    # never see a rosier picture than reality (thin-spread stragglers
    # beyond _compact_bad's group budget keep zeros for at most the
    # one step before the guard forces a re-sort).
    return rows, jnp.mean(ok.astype(jnp.float32))


# ------------------------------------------------------------- public

def interp_uvwt(tables: SlabTables, base, weights, oy: int, ox: int,
                ncell: int, cap_frac: int = 32,
                interpret: bool = False):
    """(u, v, w, T) for ~sorted parcels.

    base [n] int32 flat cell (ix*ny+iy)*npl+iz in [0, ncell);
    weights [4, n] f32 (wx, wy, wz, wt); oy/ox = npl / ny*npl strides.
    Returns ((u, v, w, T) [n] f32 each, served fraction)."""
    n = base.shape[0]
    wrap = 2 * ox
    CP, S, nanc = _plan(tables.packT.shape[1], n, ox)
    out3 = _slab_out3(tables.packT, base, weights, CP, S, ox, "uvwt",
                      nanc, ncell, wrap, interpret, out_rows=5)
    ok = _row(out3, 4, n) > 0.5
    rows = [_row(out3, r, n) for r in range(4)]
    cap = max(WIN, min(n // cap_frac, CAP_MAX))
    return _apply_fallback(tables, base + wrap, weights, rows, ok,
                           "uvwt", cap, oy, ox)


def meso_sigma(tables: SlabTables, base, oy: int, ox: int,
               ncell: int, cap_frac: int = 32,
               interpret: bool = False):
    """Subgrid wind sigma for ~sorted parcels: ((su, sv, sw), served)."""
    n = base.shape[0]
    wrap = 2 * ox
    CP, S, nanc = _plan(tables.packT.shape[1], n, ox)
    w = (jnp.zeros(n, jnp.float32),) * 4
    out3 = _slab_out3(tables.packT, base, w, CP, S, ox, "meso", nanc,
                      ncell, wrap, interpret, out_rows=4)
    ok = _row(out3, 3, n) > 0.5
    rows = [_row(out3, r, n) for r in range(3)]
    cap = max(WIN, min(n // cap_frac, CAP_MAX))
    return _apply_fallback(tables, base + wrap, w, rows, ok, "meso",
                           cap, oy, ox)


def interp_sfc(tables: SlabTables, basexy, weights, fields,
               ny: int, nxy: int, cap_frac: int = 32,
               interpret: bool = False):
    """Selected surface fields for ~sorted parcels.

    basexy [n] int32 = ix*ny+iy in [0, nxy); weights [4, n] f32
    (wx, wy, wt, 0); fields = static tuple of SFC_FIELDS indices.
    Returns (tuple of [n] f32 per field, served fraction)."""
    n = basexy.shape[0]
    wrap = 2 * ny
    CP, S, nanc = _plan(tables.sfcT.shape[1], n, 0)
    mode = ("sfc", tuple(fields))
    nv = len(fields)
    out3 = _slab_out3(tables.sfcT, basexy, weights, CP, S, 0, mode,
                      nanc, nxy, wrap, interpret, out_rows=nv + 1)
    ok = _row(out3, nv, n) > 0.5
    rows = [_row(out3, r, n) for r in range(nv)]
    cap = max(WIN, min(n // cap_frac, CAP_MAX))
    return _apply_fallback(tables, basexy + wrap, weights, rows, ok,
                           mode, cap)


def permute_f32_cols(cols, perm, cap_frac: int = 16,
                     interpret: bool = False):
    """Permute up to 8 float32 [n] columns by ``perm`` using the slab
    kernel as a BANDED gather (mode "gather8").

    After an adaptive re-sort of drifted parcels the permutation is
    locally banded — most parcels move few ranks; lon-crossers move
    +-(ny*npl*density) ranks and are handled by the anchor pairs or
    the capped fallback.  One 128-lane gather serves 128 destinations
    x 8 columns, vs ~13 ns per offset PER COLUMN for XLA's gather —
    ~8x less permute work for a full particle-state sort
    (reference module_sort's array permutation, c:5777-5805)."""
    k = len(cols)
    assert k <= 8
    n = perm.shape[0]
    npad = -(-n // 1024) * 1024
    tab = jnp.stack(
        [jnp.pad(c, (0, npad - n)) for c in cols]
        + [jnp.zeros(npad, jnp.float32)] * (8 - k))
    CP, S, nanc = _plan(npad, n, 0)
    out3 = _slab_out3(tab, perm.astype(jnp.int32),
                      (jnp.zeros(n, jnp.float32),) * 4, CP, S, 0,
                      "gather8", nanc, None, 0, interpret, out_rows=9)
    ok = _row(out3, 8, n) > 0.5
    rows = [_row(out3, r, n) for r in range(k)]
    cap = max(WIN, min(n // cap_frac, CAP_MAX))
    nbad = jnp.sum((~ok).astype(jnp.int32))

    def fix(rows_t):
        idx_bad = _compact_bad(ok, cap)
        src = jnp.take(perm, jnp.minimum(idx_bad, n - 1))
        return tuple(
            r.at[idx_bad].set(jnp.take(c, src), mode="drop")
            for r, c in zip(rows_t, cols))

    rows = jax.lax.cond(nbad > 0, fix, lambda r: r, tuple(rows))
    return list(rows)


# ----------------------------------------- module-facing convenience

def _auto_interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU test suite)."""
    return jax.default_backend() != "tpu"


def uvwt_from_loc(tables: SlabTables, met01: Met, ts, loc,
                  interpret: Optional[bool] = None):
    """(u, v, w, T) at located parcel positions via the slab kernel.
    Drop-in for fast_interp.interp_uvw_packed64 + interp_t_packed64
    (f32 arithmetic; requires ~sorted parcels)."""
    from mptrac_tpu.ops import interp
    u3 = met01.fields3d["u"]
    ny, npl = u3.shape[-2:]
    nx = u3.shape[-3]
    nxc = nx - 1 if met01.lon_periodic else nx    # cyclic period
    base = ((loc.ix * ny + loc.iy) * npl + loc.iz).astype(jnp.int32)
    wt = interp.time_weight(met01, ts)
    w4 = tuple(x.astype(jnp.float32)
               for x in (loc.wx, loc.wy, loc.wz, wt))
    (u, v, w, t), served = interp_uvwt(
        tables, base, w4, npl, ny * npl, nxc * ny * npl,
        interpret=_auto_interpret() if interpret is None else interpret)
    dtype = met01.lon.dtype
    return (u.astype(dtype), v.astype(dtype), w.astype(dtype),
            t.astype(dtype), served)


def sfc_from_loc(tables: SlabTables, met01: Met, names, ts, loc,
                 interpret: Optional[bool] = None):
    """{name: [n]} surface-field interpolation via the slab kernel.
    Drop-in for fast_interp.interp_sfc_packed."""
    from mptrac_tpu.ops import interp
    nx, ny = met01.fields2d[SFC_FIELDS[0]].shape[-2:]
    nxc = nx - 1 if met01.lon_periodic else nx    # cyclic period
    basexy = (loc.ix * ny + loc.iy).astype(jnp.int32)
    wt = interp.time_weight(met01, ts)
    w4 = tuple(x.astype(jnp.float32)
               for x in (loc.wx, loc.wy, wt, jnp.zeros_like(wt)))
    fields = tuple(SFC_FIELDS.index(name) for name in names)
    vals, served = interp_sfc(
        tables, basexy, w4, fields, ny, nxc * ny,
        interpret=_auto_interpret() if interpret is None else interpret)
    dtype = loc.wy.dtype
    return {name: v.astype(dtype) for name, v in zip(names, vals)}
