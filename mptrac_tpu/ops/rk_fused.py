"""Fused RK advection kernel — one Pallas pass per timestep.

The TPU-native answer to the reference's per-parcel hot loop
(module_advect /root/reference/src/mptrac.c:3598-3789 +
intpol_met_space_3d c:2985 + the 16-point subgrid variance of
module_diff_meso c:4280-4304 + the temperature sampling of
module_meteo c:5054): for spatially sorted parcels, ONE kernel
invocation per step performs

* every RK stage (Euler / midpoint / RK4, static ``ctl.advect``):
  in-kernel locate (regular lon + tiled compare-count over the
  irregular lat / p axes held in VMEM), corner gathers from a VMEM
  slab of the per-cell wind table, trilinear + time interpolation,
  and the position update — no XLA-side ``locate_3d`` per stage
  (which costs ~2.3 ns/parcel/stage and dominates at 100M parcels);
* the final-position serve: mesoscale subgrid wind sigma (the same
  16 corner values, reference summation order) and temperature.

Design vs the round-4 slab kernel (ops.slab_interp):

- Table is per-CELL, not per-corner: ``cellT [8, ncellp]`` rows
  (u0,v0,w0,u1,v1,w1,t0,t1).  8x less HBM (130 MB vs 1.04 GB at the
  bench grid) and 8x less slab DMA; the 8 corners are gathered as 8
  lane-shuffles from the slab instead of 1 from a 64-wide table.
- One DMA sweep per step instead of one per (RK stage x module):
  advect + meso + meteo-T shared ~5 sweeps before; now 1.
- Serving is 3 anchored window passes per stage (bulk at the group
  median, then min/max of the still-unserved), each pass gathering
  the 4 low corners from windows at the anchor and the 4 high
  (dx=1) corners from windows at anchor+ox.

Parcels the kernel cannot serve (drifted beyond the slab margins
since the last sort) are recomputed EXACTLY by a bounded XLA mirror
of the same arithmetic (tier 1, capped), and — if the straggler
count ever exceeds the cap — by a full chunked XLA recompute
(tier 2, lax.cond): no code path can silently zero winds (the
round-4 failure mode).  ``served`` is returned as a performance
signal for adaptive re-sorting only; correctness never depends on it.

fp32 fast path only: positions/weights in float32; the time weight is
evaluated as wt0 - frac*dt/(t1-t0) in f32 (the exact path keeps f64).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mptrac_tpu.types import Met

WIN = 128
U = 4                 # groups unrolled per grid step
NPASS = 4             # anchored serve passes per stage (pass 2+ are
                      # cond-skipped when everything is already served)
ROWS = 32             # table rows: 4 corner-offsets x 8 fields
SLAB_MAX = 65536      # max slab cells (32 rows x 4 B -> 8 MB VMEM)
FALLBACK_TIERS = 2    # 0 disables the XLA fallback (DIAGNOSTIC ONLY)


@dataclass
class CellPack:
    """Per-cell gather tables + locate tables for one met pair."""
    cellT: jnp.ndarray     # [32, ntotp]: row co*8+f, corner-offset
    #   co in (0, +1, +oy, +oy+1) x field f in
    #   (u0,v0,w0,u1,v1,w1,t0,t1) — one lane gather serves the whole
    #   dx-half of the 2x2x2 corner stencil
    cellR: jnp.ndarray     # [ntotp, 8] row-major mirror (XLA fallback)
    latC: jnp.ndarray      # [8, LC] compare-count tile of the lat axis
    latFlat: jnp.ndarray   # [1, NYpad] lat axis values
    pC: jnp.ndarray        # [8, PC] compare-count tile of the p axis
    pFlat: jnp.ndarray     # [1, NPpad] p axis values
    # --- static meta ---
    nx: int = 0
    ny: int = 0
    npl: int = 0
    nxc: int = 0           # cyclic lon period in columns
    wrap: int = 0          # cells prepended west of the main table
    ntot: int = 0          # main-table cells (nx*ny*npl)
    lon_periodic: bool = False
    lat_asc: bool = True
    p_asc: bool = False
    cartesian: bool = False

    def replace(self, **kw) -> "CellPack":
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    CellPack,
    data_fields=["cellT", "cellR", "latC", "latFlat", "pC", "pFlat"],
    meta_fields=["nx", "ny", "npl", "nxc", "wrap", "ntot",
                 "lon_periodic", "lat_asc", "p_asc", "cartesian"])


def _tile8(axis: np.ndarray, asc: bool) -> np.ndarray:
    """[8, >=128] compare-count tile (lane dim padded to a vreg
    multiple for Mosaic block layout); padding never counts."""
    n = axis.size
    cols = -(-n // 8)
    lanes = max(128, -(-cols // 128) * 128)
    pad = np.inf if asc else -np.inf
    a = np.full(8 * cols, pad, np.float32)
    a[:n] = axis.astype(np.float32)
    out = np.full((8, lanes), pad, np.float32)
    out[:, :cols] = a.reshape(cols, 8).T
    return out


def build_cell_pack(met01: Met) -> CellPack:
    """Build the per-cell tables (host-side axis introspection + jitted
    table assembly).  Call once per met interval."""
    u = met01.fields3d["u"]
    nx, ny, npl = u.shape[-3:]
    n = nx * ny * npl
    ox = ny * npl
    lat_np = np.asarray(met01.lat[0] if met01.lat.ndim == 2
                        else met01.lat, np.float32)
    p_np = np.asarray(met01.p[0] if met01.p.ndim == 2 else met01.p,
                      np.float32)
    lat_asc = bool(lat_np[1] > lat_np[0])
    p_asc = bool(p_np[1] > p_np[0])
    nxc = nx - 1 if met01.lon_periodic else nx
    wrapcols = 2                     # cyclic margin columns per side
    wrap = wrapcols * ox

    @functools.partial(jax.jit, static_argnames=("periodic",))
    def assemble(met01, periodic):
        u = met01.fields3d["u"]
        v = met01.fields3d["v"]
        w = met01.fields3d["w"]
        t = met01.fields3d.get("t")
        rows = [u[0], v[0], w[0], u[1], v[1], w[1]]
        rows += ([t[0], t[1]] if t is not None
                 else [jnp.zeros_like(u[0])] * 2)
        base = jnp.stack([r.reshape(n) for r in rows]).astype(
            jnp.float32)
        if periodic:                  # duplicated wrap column: period
            west = base[:, n - (wrapcols + 1) * ox:n - ox]
            east = base[:, ox:(wrapcols + 1) * ox]
        else:
            west = base[:, :wrap] * 0.0
            east = base[:, n - wrap:] * 0.0
        base = jnp.concatenate([west, base, east], axis=1)
        ntotp = -(-base.shape[1] // 1024) * 1024
        if ntotp != base.shape[1]:
            base = jnp.pad(base, ((0, 0), (0, ntotp - base.shape[1])))
        # 32-row corner-offset expansion: one lane gather serves the
        # 4 same-dx corners of the stencil (offsets 0, +1, +oy, +oy+1)
        oy = npl
        ext = jnp.pad(base, ((0, 0), (0, oy + 2)))
        cell32 = jnp.concatenate(
            [ext[:, off:off + ntotp] for off in (0, 1, oy, oy + 1)],
            axis=0)
        return cell32, base.T

    cellT, cellR = assemble(met01, bool(met01.lon_periodic))

    def flatpad(a, min_lanes):
        # [8, L] with identical rows: full-vreg reads in the kernel
        L = max(min_lanes, -(-a.size // 128) * 128)
        out = np.zeros((1, L), np.float32)
        out[0, :a.size] = a
        # repeat the last value so clamped window reads stay finite
        out[0, a.size:] = a[-1]
        return np.repeat(out, 8, axis=0)

    return CellPack(
        cellT=cellT, cellR=cellR,
        latC=jnp.asarray(_tile8(lat_np, lat_asc)),
        latFlat=jnp.asarray(flatpad(lat_np, 256)),
        pC=jnp.asarray(_tile8(p_np, p_asc)),
        pFlat=jnp.asarray(flatpad(p_np, 256)),
        nx=nx, ny=ny, npl=npl, nxc=nxc, wrap=wrap, ntot=n,
        lon_periodic=bool(met01.lon_periodic),
        lat_asc=lat_asc, p_asc=p_asc,
        cartesian=met01.coord_type != 0)


# --------------------------------------------------------------- plan

def _plan(pack: CellPack, n: int) -> Tuple[int, int, int]:
    """(CP, slabS, KW): parcels per chunk, slab cells, windows per
    anchor.  All static at trace time."""
    ox = pack.ny * pack.npl
    density = max(n / max(pack.ntot, 1), 1e-3)
    room = max(SLAB_MAX - 3 * ox - 4096, 4096)
    cp_f = max(min(density * room / 2, 1 << 21), 1 << 12)
    CP = 1 << (int(cp_f).bit_length() - 1)
    CP = max(CP, U * WIN)
    span = int(2 * CP / density)
    ntotp = pack.cellT.shape[1]
    slabS = min(-(-(span + 3 * ox + 4096) // 1024) * 1024, ntotp)
    # per-anchor windows: group span + up to 127 cells of
    # 128-alignment loss (the corner reach lives in the 32-row table)
    KW = max(1, min(4, -(-int(WIN / density + WIN) // WIN)))
    return CP, slabS, KW


def _rk_fracs(nstage: int):
    """(dts_frac, weight) per stage (reference c:3654-3676)."""
    if nstage == 4:
        return ((0.0, 1 / 6), (0.5, 2 / 6), (0.5, 2 / 6), (1.0, 1 / 6))
    if nstage == 2:
        return ((0.0, 0.0), (0.5, 1.0))
    return ((0.0, 1.0),)


# ------------------------------------------------------------- kernel

def _kernel(s_ref, pari_ref, in_ref, parf_ref, latC_ref,
            latF_ref, pC_ref, pF_ref, tab_hbm, out_ref, slab, sem, *,
            GB, slabS, KW, nstage, ny, npl, LC, PC, lat_asc, p_asc,
            lon_periodic, cartesian, nx):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    i32 = jnp.int32
    ox = ny * npl
    oy = npl

    with jax.enable_x64(False):
        c = pl.program_id(0)
        g = pl.program_id(1)
        start = s_ref[c] * WIN       # s_ref holds 128-lane window units
        ncellc = pari_ref[0]         # cyclic period (cells)
        wrap = pari_ref[1]
        ntotv = pari_ref[2]          # valid table cells (incl margins)

        def pf(i):
            # f32 params live in a small VMEM block (f32 SMEM prefetch
            # fails Mosaic legalization); [1, WIN] rows broadcast
            # cleanly into the vector arithmetic below
            return parf_ref[i:i + 1, :]

        lon0 = pf(0)
        dlon = pf(1)
        lon_first = pf(2)
        lon_last = pf(3)
        lat_lo = pf(4)
        lat_hi = pf(5)
        inv_tden = pf(6)
        re_km = f32(6367.421)
        d2r = f32(np.pi / 180.0)
        NYPAD = latF_ref.shape[-1]
        NPPAD = pF_ref.shape[-1]

        @pl.when(g == 0)
        def _():
            cp = pltpu.make_async_copy(
                tab_hbm.at[:, pl.ds(s_ref[c] * WIN, slabS)], slab,
                sem)
            cp.start()
            cp.wait()

        def count_tiled(tabC, x, n_axis, asc, nC):
            # 4 parallel accumulators: a single chained accumulator
            # serializes nC dependent adds (latency-bound on the VPU)
            accs = [jnp.zeros((8, WIN), i32) for _ in range(4)]
            for cc in range(nC):
                col = tabC[:, cc:cc + 1]
                m = (col <= x) if asc else (col > x)
                accs[cc % 4] = accs[cc % 4] + m.astype(i32)
            acc = (accs[0] + accs[1]) + (accs[2] + accs[3])
            cnt = jnp.sum(acc, axis=0, keepdims=True)
            return jnp.clip(cnt - 1, 0, n_axis - 2)

        def axis_pair(flat_ref, i, Lpad, n_axis):
            """(xx[i], xx[i+1]) from a flat axis table.

            Axes that fit 256 entries (every production vertical axis;
            1-2 degree lat axes) use two STATIC windows — no scalar
            reduce, no dynamic slice (both flush the VPU pipeline,
            ~26 cycles each).  Longer axes fall back to one dynamic
            128-aligned window pair around the group's span."""
            if n_axis <= 2 * WIN:
                w0 = flat_ref[:, 0:WIN]
                w1 = flat_ref[:, WIN:2 * WIN]
                o = i
            else:
                k0w = jnp.clip(jnp.min(i) // WIN, 0, Lpad // WIN - 2)
                w0 = flat_ref[:, pl.ds(k0w * WIN, WIN)]
                w1 = flat_ref[:, pl.ds((k0w + 1) * WIN, WIN)]
                o = i - k0w * WIN
            okw = (o >= 0) & (o < 2 * WIN - 1)

            def val(oo):
                lo = oo < WIN
                oc = jnp.broadcast_to(
                    jnp.where(lo, jnp.clip(oo, 0, WIN - 1),
                              jnp.clip(oo - WIN, 0, WIN - 1)),
                    (8, WIN))
                g0 = jnp.take_along_axis(w0, oc, axis=1)[0:1]
                g1 = jnp.take_along_axis(w1, oc, axis=1)[0:1]
                return jnp.where(lo, g0, g1)

            return val(o), val(o + 1), okw

        def locate(xlon, xlat, xp):
            """In-kernel locate_3d: identical index/weight semantics
            to ops.interp.locate_3d in f32."""
            if cartesian:
                lon2 = jnp.clip(xlon, lon_first, lon_last)
            else:
                lon2 = xlon - jnp.trunc(xlon / 360.0) * 360.0
                lon2 = jnp.where(lon2 < lon_first, lon2 + 360.0, lon2)
                lon2 = jnp.where(lon2 > lon_last, lon2 - 360.0, lon2)
            lat2 = jnp.clip(xlat, lat_lo, lat_hi)
            ix = jnp.clip(jnp.floor((lon2 - lon0) / dlon).astype(i32),
                          0, nx - 2)
            iy = count_tiled(latC_ref[...], lat2, ny, lat_asc, LC)
            iz = count_tiled(pC_ref[...], xp, npl, p_asc, PC)
            x0 = lon0 + ix.astype(f32) * dlon
            x1 = x0 + dlon
            wx = (x1 - lon2) / (x1 - x0)
            y0, y1, oky = axis_pair(latF_ref, iy, NYPAD, ny)
            wy = (y1 - lat2) / (y1 - y0)
            p0, p1, okz = axis_pair(pF_ref, iz, NPPAD, npl)
            wz = (p1 - xp) / (p1 - p0)
            idx = (ix * ny + iy) * npl + iz
            return idx, wx, wy, wz, oky & okz

        def gather_win(Aw, off):
            """[ROWS, WIN] slab values at window-unit base Aw (lane
            offset Aw*WIN) + lane offsets off, plus the hit mask.
            One take serves the whole 4-corner dx-half (the corner
            offsets live in the table rows).  The *WIN multiply stays
            inside pl.ds so Mosaic can prove 128-alignment."""
            acc = jnp.zeros((ROWS, WIN), f32)
            hit = jnp.zeros((1, WIN), jnp.bool_)
            for j in range(KW):
                w = slab[:, pl.ds((Aw + j) * WIN, WIN)]
                oj = off - j * WIN
                inj = (oj >= 0) & (oj < WIN)
                gj = jnp.take_along_axis(
                    w, jnp.broadcast_to(jnp.where(inj, oj, 0),
                                        (ROWS, WIN)), axis=1)
                acc = jnp.where(inj, gj, acc)
                hit = hit | inj
            return acc, hit

        def gather3(lanes, positions):
            """[ROWS, WIN] values at per-parcel slab lanes, scanned
            over 3 prefetched window positions (the west-crossed /
            in-place / east-crossed classes of an RK-stage cell
            relative to the group's base cell).  No scalar reduces,
            no branches: the common sorted case is fully served
            here."""
            acc = jnp.zeros((ROWS, WIN), f32)
            hit = jnp.zeros((1, WIN), jnp.bool_)
            for Aw in positions:
                v, h = gather_win(Aw, lanes - Aw * WIN)
                acc = jnp.where(h & ~hit, v, acc)
                hit = hit | h
            return acc, hit

        def serve(d):
            """(vlo, vhi, ok): the dx=0 / dx=1 corner-block values
            [ROWS, WIN] at slab coords d [1, WIN].

            Pass 1 anchors on the group's MEDIAN-lane cell (one lane
            extract — robust against RK-midpoint lon-crossers, which
            would skew a min-reduce by a whole column) and scans the
            windows of the base cell and its +-1-longitude-crossed
            neighbours — branch-free.  Residue (median itself crossed,
            drift beyond one column, span overflow) goes through ONE
            lax.cond into an ascending min-unserved sweep."""
            amaxw = slabS // WIN - KW
            B = d[0, WIN // 2]
            Am = jnp.clip((B - ox) // WIN, 0, amaxw)
            A0 = jnp.clip(B // WIN, 0, amaxw)
            Ae = jnp.clip((B + ox) // WIN, 0, amaxw)
            Aee = jnp.clip((B + 2 * ox) // WIN, 0, amaxw)
            vlo, hlo = gather3(d, (Am, A0, Ae))
            vhi, hhi = gather3(d + ox, (A0, Ae, Aee))
            # have-masks as f32 0/1: i1 vector carries fail Mosaic's
            # scf.if legalization
            st = (vlo, vhi, hlo.astype(f32), hhi.astype(f32))

            def do_pass(st, Aw, AEw):
                vlo, vhi, hlo, hhi = st
                v, hit = gather_win(Aw, d - Aw * WIN)
                vlo = jnp.where(hit & (hlo == 0), v, vlo)
                hlo = jnp.maximum(hlo, hit.astype(f32))
                v, hit = gather_win(AEw, d + ox - AEw * WIN)
                vhi = jnp.where(hit & (hhi == 0), v, vhi)
                hhi = jnp.maximum(hhi, hit.astype(f32))
                return (vlo, vhi, hlo, hhi)

            def refine(st):
                for ps in range(1, NPASS):
                    done = st[2] * st[3]
                    Araw = jnp.min(jnp.where(done > 0,
                                             jnp.int32(2 ** 30), d))
                    Aw = jnp.clip(Araw // WIN, 0, amaxw)
                    AEw = jnp.clip((Araw + ox) // WIN, 0, amaxw)
                    st = do_pass(st, Aw, AEw)
                return st

            nbad = jnp.max(1.0 - st[2] * st[3])
            st = jax.lax.cond(nbad > 0, refine, lambda x: x, st)
            return st[0], st[1], (st[2] > 0) & (st[3] > 0)

        def trilerp(vlo, vhi, wx, wy, wz):
            """[8, WIN] (u0,v0,w0,u1,v1,w1,t0,t1) at the parcel point
            from the two corner-block gathers — row co*8+f with
            co = dy*2+dz; arithmetic order of ops.interp.interp_3d."""
            def L(w, a, b):
                return w * (a - b) + b

            def co(blk, dy, dz):
                k = dy * 2 + dz
                return blk[k * 8:(k + 1) * 8]
            a00 = L(wz, co(vlo, 0, 0), co(vlo, 0, 1))
            a01 = L(wz, co(vlo, 1, 0), co(vlo, 1, 1))
            a10 = L(wz, co(vhi, 0, 0), co(vhi, 0, 1))
            a11 = L(wz, co(vhi, 1, 0), co(vhi, 1, 1))
            a0 = L(wy, a00, a01)
            a1 = L(wy, a10, a11)
            return L(wx, a0, a1)

        def slab_coord(idx):
            """Table->slab coordinate with validity-checked cyclic
            unwrap: a representation is usable only if the full corner
            stencil lies inside the slab's VALID data (margins yes,
            zero padding no).  Unservable -> exact XLA fallback."""
            vend = jnp.minimum(ntotv - start, slabS) - (ox + 1)
            d0 = idx + wrap - start

            def okd(x):
                return (x >= 0) & (x <= vend)

            if lon_periodic:
                dp = d0 + ncellc
                dm = d0 - ncellc
                d = jnp.where(okd(d0), d0,
                              jnp.where(okd(dp), dp, dm))
            else:
                d = d0
            return d, okd(d)

        def dx2coord(dxm, lat):
            """fp-op order of ops.thermo.dx2coord (f32)."""
            if cartesian:
                return dxm
            near = (lat < f32(-89.999)) | (lat > f32(89.999))
            den = (f32(np.pi) * re_km
                   * jnp.cos(jnp.where(near, f32(0.0), lat) * d2r))
            return jnp.where(near, f32(0.0),
                             (dxm / f32(1000.0)) * f32(180.0) / den)

        def dy2coord(dym):
            if cartesian:
                return dym
            return (dym / f32(1000.0)) * f32(180.0) / (f32(np.pi)
                                                       * re_km)

        for uu in range(U):
            sl = slice(uu * WIN, (uu + 1) * WIN)
            lon = in_ref[0:1, sl]
            lat = in_ref[1:2, sl]
            p = in_ref[2:3, sl]
            dtp = in_ref[3:4, sl]
            wt0 = in_ref[4:5, sl]

            ok = jnp.ones((1, WIN), jnp.bool_)
            um = jnp.zeros((1, WIN), f32)
            vm = jnp.zeros((1, WIN), f32)
            wm = jnp.zeros((1, WIN), f32)
            uprev = vprev = wprev = None
            lat_node = lat

            fracs = _rk_fracs(nstage)
            for i, (frac, kwt) in enumerate(fracs):
                if i == 0:
                    xlon, xlat, xp = lon, lat, p
                else:
                    dts = f32(frac) * dtp
                    xlon = lon + dx2coord(dts * uprev, lat)
                    xlat = lat + dy2coord(dts * vprev)
                    xp = p + dts * wprev
                wt = wt0 - (f32(frac) * dtp) * inv_tden
                idx, wx, wy, wz, okl = locate(xlon, xlat, xp)
                d, okd = slab_coord(idx)
                vlo, vhi, oks = serve(jnp.where(okd, d, 0))
                oks = oks & okd
                f = trilerp(vlo, vhi, wx, wy, wz)  # [8, WIN]
                ui = wt * (f[0:1] - f[3:4]) + f[3:4]
                vi = wt * (f[1:2] - f[4:5]) + f[4:5]
                wi = wt * (f[2:3] - f[5:6]) + f[5:6]
                ok = ok & okl & oks
                um = um + f32(kwt) * ui
                vm = vm + f32(kwt) * vi
                wm = wm + f32(kwt) * wi
                uprev, vprev, wprev = ui, vi, wi
                lat_node = xlat

            lat_dx = lat_node if nstage == 2 else lat
            nlon = lon + dx2coord(dtp * um, lat_dx)
            nlat = lat + dy2coord(dtp * vm)
            np_ = p + dtp * wm

            # final-position serve: meso sigma + temperature
            wtf = wt0 - dtp * inv_tden
            idxf, wxf, wyf, wzf, oklf = locate(nlon, nlat, np_)
            df, okdf = slab_coord(idxf)
            vlof, vhif, oksf = serve(jnp.where(okdf, df, 0))
            oksf = oksf & okdf
            ff = trilerp(vlof, vhif, wxf, wyf, wzf)
            Tf = wtf * (ff[6:7] - ff[7:8]) + ff[7:8]
            # 16-point subgrid sigma, reference summation order
            # (corner-major, per corner u0 then u1; c:4280-4304)
            sigs = []
            for comp in range(3):
                mean = jnp.zeros((1, WIN), f32)
                msq = jnp.zeros((1, WIN), f32)
                for dx in (0, 1):
                    for dy in (0, 1):
                        for dz in (0, 1):
                            blk = vlof if dx == 0 else vhif
                            r0 = (dy * 2 + dz) * 8
                            for sn in (0, 1):
                                rr = r0 + comp + 3 * sn
                                val = blk[rr:rr + 1]
                                mean = mean + val
                                msq = msq + val * val
                mean = mean * f32(1.0 / 16.0)
                msq = msq * f32(1.0 / 16.0)
                var = msq - mean * mean
                sigs.append(jnp.where(var > 0,
                                      jnp.sqrt(jnp.maximum(var, 0.0)),
                                      0.0))
            ok = ok & oklf & oksf
            okf = ok.astype(f32)
            out = jnp.concatenate(
                [nlon, nlat, np_, sigs[0], sigs[1], sigs[2], Tf, okf],
                axis=0) * okf
            out_ref[:, sl] = out


# ------------------------------------------------------- XLA mirror

def _xla_locate(pack: CellPack, parf, xlon, xlat, xp):
    """f32 locate with the kernel's (= ops.interp.locate_3d's) index
    and weight semantics, on arbitrary-length vectors."""
    f32 = jnp.float32
    (lon0, dlon, lon_first, lon_last, lat_lo, lat_hi, _) = parf
    if pack.cartesian:
        lon2 = jnp.clip(xlon, lon_first, lon_last)
    else:
        lon2 = xlon - jnp.trunc(xlon / 360.0) * 360.0
        lon2 = jnp.where(lon2 < lon_first, lon2 + 360.0, lon2)
        lon2 = jnp.where(lon2 > lon_last, lon2 - 360.0, lon2)
    lat2 = jnp.clip(xlat, lat_lo, lat_hi)
    ix = jnp.clip(jnp.floor((lon2 - lon0) / dlon).astype(jnp.int32),
                  0, pack.nx - 2)
    latv = pack.latFlat[0, :pack.ny]
    pv = pack.pFlat[0, :pack.npl]
    if pack.lat_asc:
        iy = jnp.sum(latv <= lat2[:, None], axis=-1).astype(jnp.int32)
    else:
        iy = jnp.sum(latv > lat2[:, None], axis=-1).astype(jnp.int32)
    iy = jnp.clip(iy - 1, 0, pack.ny - 2)
    if pack.p_asc:
        iz = jnp.sum(pv <= xp[:, None], axis=-1).astype(jnp.int32)
    else:
        iz = jnp.sum(pv > xp[:, None], axis=-1).astype(jnp.int32)
    iz = jnp.clip(iz - 1, 0, pack.npl - 2)
    x0 = lon0 + ix.astype(f32) * dlon
    x1 = x0 + dlon
    wx = (x1 - lon2) / (x1 - x0)
    y0 = jnp.take(pack.latFlat[0], iy)
    y1 = jnp.take(pack.latFlat[0], iy + 1)
    wy = (y1 - lat2) / (y1 - y0)
    p0 = jnp.take(pack.pFlat[0], iz)
    p1 = jnp.take(pack.pFlat[0], iz + 1)
    wz = (p1 - xp) / (p1 - p0)
    return (ix * pack.ny + iy) * pack.npl + iz, wx, wy, wz


def _xla_serve(pack: CellPack, idx):
    """8 corner rows [n, 8] from the row-major mirror."""
    oy = pack.npl
    ox = pack.ny * pack.npl
    b = idx + pack.wrap
    return [jnp.take(pack.cellR, b + ck, axis=0)
            for ck in (0, 1, oy, oy + 1, ox, ox + 1, ox + oy,
                       ox + oy + 1)]


def _xla_trilerp(vals, wx, wy, wz):
    def L(w, a, b):
        return w[:, None] * (a - b) + b
    a00 = L(wz, vals[0], vals[1])
    a01 = L(wz, vals[2], vals[3])
    a10 = L(wz, vals[4], vals[5])
    a11 = L(wz, vals[6], vals[7])
    a0 = L(wy, a00, a01)
    a1 = L(wy, a10, a11)
    return L(wx, a0, a1)                               # [n, 8]


def rk_xla(pack: CellPack, parf, nstage: int, cartesian: bool,
           lon, lat, p, dtp, wt0):
    """XLA mirror of the kernel arithmetic (f32), for straggler
    recompute and testing.  Returns (nlon, nlat, np, su, sv, sw, T)."""
    from mptrac_tpu.ops.thermo import dx2coord, dy2coord
    f32 = jnp.float32
    inv_tden = parf[6]
    um = vm = wm = f32(0.0)
    uprev = vprev = wprev = None
    lat_node = lat
    for i, (frac, kwt) in enumerate(_rk_fracs(nstage)):
        if i == 0:
            xlon, xlat, xp = lon, lat, p
        else:
            dts = f32(frac) * dtp
            xlon = lon + dx2coord(dts * uprev, lat, cartesian)
            xlat = lat + dy2coord(dts * vprev, cartesian)
            xp = p + dts * wprev
        wt = wt0 - (f32(frac) * dtp) * inv_tden
        idx, wx, wy, wz = _xla_locate(pack, parf, xlon, xlat, xp)
        vals = _xla_serve(pack, idx)
        f = _xla_trilerp(vals, wx, wy, wz)
        ui = wt * (f[:, 0] - f[:, 3]) + f[:, 3]
        vi = wt * (f[:, 1] - f[:, 4]) + f[:, 4]
        wi = wt * (f[:, 2] - f[:, 5]) + f[:, 5]
        um = um + f32(kwt) * ui
        vm = vm + f32(kwt) * vi
        wm = wm + f32(kwt) * wi
        uprev, vprev, wprev = ui, vi, wi
        lat_node = xlat
    lat_dx = lat_node if nstage == 2 else lat
    nlon = lon + dx2coord(dtp * um, lat_dx, cartesian)
    nlat = lat + dy2coord(dtp * vm, cartesian)
    np_ = p + dtp * wm
    wtf = wt0 - dtp * inv_tden
    idxf, wxf, wyf, wzf = _xla_locate(pack, parf, nlon, nlat, np_)
    valsf = _xla_serve(pack, idxf)
    ff = _xla_trilerp(valsf, wxf, wyf, wzf)
    T = wtf * (ff[:, 6] - ff[:, 7]) + ff[:, 7]
    sigs = []
    for comp in range(3):
        mean = jnp.zeros_like(T)
        msq = jnp.zeros_like(T)
        for k in range(8):
            for s in (0, 1):
                val = valsf[k][:, comp + 3 * s]
                mean = mean + val
                msq = msq + val * val
        mean = mean * f32(1.0 / 16.0)
        msq = msq * f32(1.0 / 16.0)
        var = msq - mean * mean
        sigs.append(jnp.where(var > 0,
                              jnp.sqrt(jnp.maximum(var, 0.0)), 0.0))
    return nlon, nlat, np_, sigs[0], sigs[1], sigs[2], T


# ------------------------------------------------------------ driver

def _params(pack: CellPack, met01: Met):
    """Traced parameter vectors (f32 + i32) from the met pair."""
    lons = met01.lon[0] if met01.lon.ndim == 2 else met01.lon
    lats = met01.lat[0] if met01.lat.ndim == 2 else met01.lat
    lon0 = lons[0].astype(jnp.float32)
    dlon = (lons[1] - lons[0]).astype(jnp.float32)
    lat_lo = jnp.minimum(lats[0], lats[-1]).astype(jnp.float32)
    lat_hi = jnp.maximum(lats[0], lats[-1]).astype(jnp.float32)
    t0, t1 = met01.time[0], met01.time[1]
    inv_tden = (1.0 / (t1 - t0)).astype(jnp.float32)
    parf = jnp.stack([lon0, dlon, lons[0].astype(jnp.float32),
                      lons[-1].astype(jnp.float32), lat_lo, lat_hi,
                      inv_tden])
    ncellc = pack.nxc * pack.ny * pack.npl
    pari = jnp.asarray([ncellc, pack.wrap, pack.ntot + 2 * pack.wrap],
                       jnp.int32)
    return parf, pari


def _compact_bad_groups(ok, cap_g):
    """Index list of WHOLE 128-parcel groups containing stragglers,
    bounded by cap_g groups (cumsum compaction — top_k over the group
    axis crashes the TPU runtime inside a lax.scan at 50M+).

    Returns ([cap_g*WIN] parcel indices, n_bad_groups).  Entries of
    served parcels inside a picked group simply get recomputed with
    identical arithmetic; slots beyond the real group count return an
    out-of-range index (scatter mode='drop')."""
    n = ok.shape[0]
    ng = -(-n // WIN)
    badp = jnp.pad(~ok, (0, ng * WIN - n))
    gflag = jnp.any(badp.reshape(ng, WIN), axis=1)
    gslot = jnp.cumsum(gflag.astype(jnp.int32)) - 1
    ngbad = jnp.sum(gflag.astype(jnp.int32))
    # scatter bad-group ids into their slots
    slots = jnp.full(cap_g, ng, jnp.int32)
    tgt = jnp.where(gflag, jnp.minimum(gslot, cap_g - 1), cap_g)
    slots = slots.at[tgt].set(jnp.arange(ng, dtype=jnp.int32),
                              mode="drop")
    idx = (slots[:, None] * WIN
           + jnp.arange(WIN, dtype=jnp.int32)).reshape(-1)
    return jnp.where(idx < n, idx, n), ngbad


@functools.partial(
    jax.jit,
    static_argnames=("nstage", "CP", "slabS", "KW", "interpret",
                     "pack_static"))
def _launch(cellT, latC, latF, pC, pF, s, pari, parf, xin,
            nstage, CP, slabS, KW, interpret, pack_static):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (nx, ny, npl, LC, PC, lat_asc, p_asc, lon_periodic,
     cartesian) = pack_static
    npad = xin.shape[1]
    nchunk = npad // CP
    GB = CP // (U * WIN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunk, GB),
        in_specs=[
            pl.BlockSpec((8, U * WIN), lambda c, g, *_: (c * 0,
                                                         c * GB + g)),
            pl.BlockSpec((8, WIN), lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(latC.shape,
                         lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(latF.shape,
                         lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(pC.shape, lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(pF.shape, lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, U * WIN),
                               lambda c, g, *_: (c * 0, c * GB + g)),
        scratch_shapes=[
            pltpu.VMEM((ROWS, slabS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(
        _kernel, GB=GB, slabS=slabS, KW=KW, nstage=nstage, ny=ny,
        npl=npl, LC=LC, PC=PC, lat_asc=lat_asc, p_asc=p_asc,
        lon_periodic=lon_periodic, cartesian=cartesian, nx=nx)
    parfv = jnp.broadcast_to(
        jnp.pad(parf.astype(jnp.float32), (0, 8 - parf.shape[0]))
        [:, None], (8, WIN))
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        interpret=interpret,
    )(s, pari, xin, parfv, latC, latF, pC, pF, cellT)


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def advect_all(pack: CellPack, met01: Met, nstage: int,
               lon, lat, p, dtp, wt0, cap_frac: int = 4096,
               interpret: Optional[bool] = None):
    """Fused advect + final-position sigma/T for sorted parcels.

    Inputs f32 [n] (wt0 = time weight at the parcel's current time).
    Returns ((nlon, nlat, np, su, sv, sw, T), served) — every parcel
    exact: kernel, else capped XLA tier-1 recompute, else full XLA
    tier-2 recompute under lax.cond (never silent zeros)."""
    if interpret is None:
        interpret = _auto_interpret()
    n = lon.shape[0]
    CP, slabS, KW = _plan(pack, n)
    nchunk = -(-n // CP)
    npad = nchunk * CP
    parf, pari = _params(pack, met01)

    xin = jnp.zeros((8, npad), jnp.float32)
    for r, a in enumerate((lon, lat, p, dtp, wt0)):
        xin = xin.at[r, :n].set(a.astype(jnp.float32))
    if npad != n:   # replicate a live parcel into the padding
        xin = xin.at[:, n:].set(xin[:, n - 1:n])

    # slab window starts from the chunk-boundary parcels' cells
    bidx, _, _, _ = _xla_locate(pack, parf, xin[0, ::CP],
                                xin[1, ::CP], xin[2, ::CP])
    ox = pack.ny * pack.npl
    ntotp = pack.cellT.shape[1]
    s = (jnp.clip(bidx + pack.wrap - ox - 2048, 0, ntotp - slabS)
         // WIN).astype(jnp.int32)

    pack_static = (pack.nx, pack.ny, pack.npl,
                   -(-pack.ny // 8), -(-pack.npl // 8),
                   pack.lat_asc, pack.p_asc,
                   pack.lon_periodic, pack.cartesian)
    out = _launch(pack.cellT, pack.latC, pack.latFlat, pack.pC,
                  pack.pFlat, s, pari, parf, xin, nstage, CP,
                  slabS, KW, interpret, pack_static)

    rows = [out[r, :n] for r in range(7)]
    ok = out[7, :n] > 0.5
    served = jnp.mean(ok.astype(jnp.float32))
    ng = -(-n // WIN)
    badp = jnp.pad(~ok, (0, ng * WIN - n))
    ngbad = jnp.sum(jnp.any(badp.reshape(ng, WIN), axis=1)
                    .astype(jnp.int32))
    cap_g = max(4, n // cap_frac // WIN)

    cartesian = pack.cartesian

    def tier1(rows_t):
        idx_bad, _ = _compact_bad_groups(ok, cap_g)
        sub = [jnp.take(a, jnp.minimum(idx_bad, n - 1))
               for a in (lon, lat, p, dtp, wt0)]
        vals = rk_xla(pack, parf, nstage, cartesian, *sub)
        return tuple(r.at[idx_bad].set(v, mode="drop")
                     for r, v in zip(rows_t, vals))

    cap_g2 = min(ng, 64 * cap_g)

    def tier2(rows_t):
        # straggler groups exceeded the tier-1 cap: same bounded
        # recompute at a 64x larger cap (a full-ensemble lax.map
        # recompute here crashes the TPU runtime inside lax.scan)
        idx_bad, _ = _compact_bad_groups(ok, cap_g2)
        sub = [jnp.take(a, jnp.minimum(idx_bad, n - 1))
               for a in (lon, lat, p, dtp, wt0)]
        vals = rk_xla(pack, parf, nstage, cartesian, *sub)
        return tuple(r.at[idx_bad].set(v, mode="drop")
                     for r, v in zip(rows_t, vals))

    def tier3(rows_t):
        # locality collapsed beyond every cap: POISON the unserved
        # parcels with NaN so nothing downstream can silently use
        # zeroed winds; the driver detects served_min below the hard
        # floor and aborts loudly (reference analog: the hard NP
        # overflow abort, mptrac.c:2281)
        return tuple(jnp.where(ok, r, jnp.float32(jnp.nan))
                     for r in rows_t)

    if FALLBACK_TIERS == 0:       # diagnostic mode only
        return tuple(rows), served
    if FALLBACK_TIERS == 1:       # tier-1 only (diagnostic)
        rows = jax.lax.cond(ngbad > 0, tier1, lambda r: r,
                            tuple(rows))
        return rows, served
    # single lax.switch, NOT nested lax.cond: nested conds inside a
    # lax.scan body crash the TPU runtime at large n (round-3/4 note)
    branch = jnp.where(
        ngbad > cap_g2, 3,
        jnp.where(ngbad > cap_g, 2, jnp.where(ngbad > 0, 1, 0)))
    rows = jax.lax.switch(branch, [lambda r: r, tier1, tier2, tier3],
                          tuple(rows))
    return rows, served
