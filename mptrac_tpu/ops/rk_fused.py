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

- Z-MAJOR cell order: flat cell = (iz*nx + ix)*ny + iy (module_sort
  uses the same key).  Parcels on one pressure level drift RIGIDLY
  (vertical cell-crossing is ~0 between sorts), so vertical wind
  shear — which tears x-major sorted groups apart within ~10 steps —
  no longer degrades locality; and a longitude step is +-ny lanes
  (not +-ny*npl), so horizontal drift stays inside tiny slab margins.
- Table is per-cell with the corner OFFSETS baked into the rows:
  ``cellT [32, nlanes]`` rows (dz*2+dx)*8+field, columns padded with
  per-level cyclic margin columns so dateline crossers resolve via
  the +-nxc*ny wrap candidates.  One take serves 2x2 of the corner
  stencil; the remaining dy corner is lane +1.
- One DMA sweep per STEP instead of one per (RK stage x module):
  advect + meso + meteo-T shared ~5 sweeps before; now 1.
- Serving: per stage, 2 corner-offset gathers x KW 128-lane windows
  anchored at the group's median-lane cell — branch-free, scalar-free
  in the common case; residue behind one lax.cond refinement sweep.

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
NPASS = 1             # serve passes per stage.  >1 adds lax.cond
                      # refinement sweeps — but a value-carrying cond
                      # spills the 16-vreg serve state to VMEM and
                      # costs ~6 ns/parcel PER SERVE on v5e, so the
                      # production setting is 1: the single pass's
                      # window is sized to cover the whole group plus
                      # one longitude-cell crossing, and the rare
                      # residue goes to the XLA fallback tiers.
ROWS = 64             # table rows: 8 corner-offsets x 8 fields
SLAB_MAX = 32768      # max slab lanes (64 rows x 4 B -> 8 MB VMEM)
FALLBACK_TIERS = 2    # 0 disables the XLA fallback (DIAGNOSTIC ONLY)


@dataclass
class CellPack:
    """Per-cell gather tables + locate tables for one met pair."""
    cellT: jnp.ndarray     # [64, nlanes]: row (dy*4+dz*2+dx)*8+f,
    #   field f in (u0,v0,w0,u1,v1,w1,t0,t1) — ONE lane gather serves
    #   the parcel's entire 2x2x2 corner stencil (all corner offsets
    #   live in the rows).  Lane = (iz*nxT + ix + 1)*ny + iy with one
    #   west / two east cyclic margin columns per level (nxT = nx+3).
    cellR: jnp.ndarray     # [nlanes, 8] row-major mirror (XLA fallback)
    latC: jnp.ndarray      # [8, LC] compare-count tile of the lat axis
    latFlat: jnp.ndarray   # [1, NYpad] lat axis values
    pC: jnp.ndarray        # [8, PC] compare-count tile of the p axis
    pFlat: jnp.ndarray     # [1, NPpad] p axis values
    # --- static meta ---
    nx: int = 0
    ny: int = 0
    npl: int = 0
    nxc: int = 0           # cyclic lon period in columns
    nxT: int = 0           # table columns per level (nx + margins)
    ntot: int = 0          # main cells (nx*ny*npl)
    lon_periodic: bool = False
    lat_asc: bool = True
    lat_reg: bool = False  # lat axis exactly arithmetic
    p_asc: bool = False
    cartesian: bool = False

    def replace(self, **kw) -> "CellPack":
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    CellPack,
    data_fields=["cellT", "cellR", "latC", "latFlat", "pC", "pFlat"],
    meta_fields=["nx", "ny", "npl", "nxc", "nxT", "ntot",
                 "lon_periodic", "lat_asc", "lat_reg", "p_asc",
                 "cartesian"])


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
    nxT = nx + 3   # 1 west + 2 east cyclic margin columns per level

    @functools.partial(jax.jit, static_argnames=("periodic",))
    def assemble(met01, periodic):
        u = met01.fields3d["u"]
        v = met01.fields3d["v"]
        w = met01.fields3d["w"]
        t = met01.fields3d.get("t")
        flds = [u[0], v[0], w[0], u[1], v[1], w[1]]
        flds += ([t[0], t[1]] if t is not None
                 else [jnp.zeros_like(u[0])] * 2)
        # z-major 3-D view [8, npl, nx, ny]
        b3 = jnp.stack([jnp.transpose(f, (2, 0, 1)) for f in flds]
                       ).astype(jnp.float32)
        # per-level cyclic margin columns: west = ix nxc-1, east =
        # ix 1, 2 (the grid's own last column duplicates ix 0) — the
        # dateline wrap candidates d -+ nxc*ny land on them
        if periodic:
            wcol = b3[:, :, nxc - 1:nxc]
            e1 = b3[:, :, 1:2]
            e2 = b3[:, :, 2:3]
        else:
            wcol = b3[:, :, :1] * 0.0
            e1 = b3[:, :, -1:] * 0.0
            e2 = e1
        b3x = jnp.concatenate([wcol, b3, e1, e2], axis=2)

        def shift(dy, dz, dx):
            a = b3x
            if dz:   # +1 level; top clamp is never read (iz<=npl-2)
                a = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
            if dx:   # +1 lon column within the padded level
                a = jnp.concatenate([a[:, :, 1:], a[:, :, -1:]],
                                    axis=2)
            if dy:   # +1 lat row; edge clamp never read (iy<=ny-2)
                a = jnp.concatenate([a[:, :, :, 1:], a[:, :, :, -1:]],
                                    axis=3)
            return a.reshape(8, npl * nxT * ny)

        base = shift(0, 0, 0)
        nlanes = -(-base.shape[1] // 1024) * 1024

        def padl(a):
            return jnp.pad(a, ((0, 0), (0, nlanes - a.shape[1])))

        cell64 = jnp.concatenate(
            [padl(shift(dy, dz, dx))
             for dy in (0, 1) for dz in (0, 1) for dx in (0, 1)],
            axis=0)
        return cell64, padl(base).T

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
        nx=nx, ny=ny, npl=npl, nxc=nxc, nxT=nxT, ntot=n,
        lon_periodic=bool(met01.lon_periodic),
        lat_asc=lat_asc,
        lat_reg=bool(np.all(lat_np == lat_np[0]
                            + np.arange(ny, dtype=np.float32)
                            * (lat_np[1] - lat_np[0]))),
        p_asc=p_asc,
        cartesian=met01.coord_type != 0)


# --------------------------------------------------------------- plan

def _plan(pack: CellPack, n: int) -> Tuple[int, int, int]:
    """(CP, slabS, KW): parcels per chunk, slab lanes, windows per
    anchor.  All static at trace time.  In the z-major layout the
    corner reach is +-1 lane (dy) — the dz/dx reach lives in the
    table rows — so slab margins are tiny and slabS ~ chunk span."""
    density = max(n / max(pack.ntot, 1), 1e-3)
    room = max(SLAB_MAX - 2 * pack.ny - 4096, 4096)
    cp_f = max(min(density * room / 2, 1 << 21), 1 << 12)
    CP = 1 << (int(cp_f).bit_length() - 1)
    CP = max(CP, U * WIN)
    span = int(2 * CP / density)
    ntotp = pack.cellT.shape[1]
    slabS = min(-(-(span + 2 * pack.ny + 4096) // 1024) * 1024,
                ntotp)
    # single-pass window reach: half the group span + one longitude
    # cell (ny lanes, the RK-midpoint crosser distance) + alignment
    KW = max(2, min(8, -(-int(pack.ny + WIN / density / 2 + 130)
                         // (WIN // 2))))
    return CP, slabS, KW


def _rk_fracs(nstage: int):
    """(dts_frac, weight) per stage (reference c:3654-3676)."""
    if nstage == 4:
        return ((0.0, 1 / 6), (0.5, 2 / 6), (0.5, 2 / 6), (1.0, 1 / 6))
    if nstage == 2:
        return ((0.0, 0.0), (0.5, 1.0))
    return ((0.0, 1.0),)


# ------------------------------------------------------------- kernel

def _kernel(s_ref, pari_ref, lon_ref, lat_ref, pp_ref, dt_ref,
            wt_ref, parf_ref, latC_ref, latF_ref, pC_ref, pF_ref,
            tab_hbm, o0, o1, o2, o3, o4, o5, o6, o7, slab, sem, *,
            GB, slabS, KW, nstage, ny, npl, LC, PC, lat_asc, p_asc,
            lon_periodic, cartesian, nx, NXT, NXC, lat_reg):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    i32 = jnp.int32

    with jax.enable_x64(False):
        c = pl.program_id(0)
        g = pl.program_id(1)
        start = s_ref[c] * WIN       # s_ref holds 128-lane window units
        oxl = pari_ref[0]            # dateline wrap offset (lanes)
        nlv = pari_ref[1]            # valid table lanes

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
        # arithmetic-lat parameters derived from the value table
        # (exactly the values the weight lookup uses)
        latw0 = latF_ref[:, 0:WIN]
        lat0 = latw0[0:1, 0:1]
        dlat = latw0[0:1, 1:2] - latw0[0:1, 0:1]
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
            if lat_reg:
                # exactly-arithmetic axis: index arithmetic replaces
                # the 23-iteration compare-count (same result for all
                # clipped inputs; mirrors ops.interp locate_reg)
                iy = jnp.clip(jnp.floor((lat2 - lat0)
                                        / dlat).astype(i32),
                              0, ny - 2)
            else:
                iy = count_tiled(latC_ref[...], lat2, ny, lat_asc,
                                 LC)
            iz = count_tiled(pC_ref[...], xp, npl, p_asc, PC)
            x0 = lon0 + ix.astype(f32) * dlon
            x1 = x0 + dlon
            wx = (x1 - lon2) / (x1 - x0)
            y0, y1, oky = axis_pair(latF_ref, iy, NYPAD, ny)
            wy = (y1 - lat2) / (y1 - y0)
            p0, p1, okz = axis_pair(pF_ref, iz, NPPAD, npl)
            wz = (p1 - xp) / (p1 - p0)
            lane = (iz * NXT + ix + 1) * ny + iy
            return lane, ix, wx, wy, wz, oky & okz

        def gather_win(Aw, lanes):
            """[ROWS, WIN] slab values at per-parcel slab lanes from
            KW windows at window-unit base Aw, plus the hit mask.
            One take serves the whole (dz,dx) 2x2 of the corner
            stencil (those offsets live in the table rows).  The *WIN
            multiply stays inside pl.ds so Mosaic can prove
            128-alignment of the dynamic offset."""
            acc = jnp.zeros((ROWS, WIN), f32)
            hit = jnp.zeros((1, WIN), jnp.bool_)
            off = lanes - Aw * WIN
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

        def serve(d):
            """(cv, ok): the full corner-stencil values [64, WIN] at
            slab lanes d [1, WIN], plus the served mask.

            One anchored window set per group, centered on the
            MEDIAN-lane cell (one lane extract) and wide enough for
            the group span plus one longitude-cell crossing; the rare
            residue (dateline margin reps, span overflow, unsorted
            input) goes to the XLA fallback tiers — an in-kernel
            value-carrying lax.cond refinement would spill the serve
            state to VMEM and cost more than it saves."""
            amaxw = slabS // WIN - KW
            B = d[0, WIN // 2]
            A0 = jnp.clip((B - KW * (WIN // 2)) // WIN, 0, amaxw)
            return gather_win(A0, d)

        def trilerp(cv, wx, wy, wz):
            """[8, WIN] (u0,v0,w0,u1,v1,w1,t0,t1) at the parcel point
            from the corner-stencil gather — row (dy*4+dz*2+dx)*8+f;
            arithmetic order of ops.interp.interp_3d."""
            def L(w, a, b):
                return w * (a - b) + b

            def co(dx, dy, dz):
                k = dy * 4 + dz * 2 + dx
                return cv[k * 8:(k + 1) * 8]
            a00 = L(wz, co(0, 0, 0), co(0, 0, 1))
            a01 = L(wz, co(0, 1, 0), co(0, 1, 1))
            a10 = L(wz, co(1, 0, 0), co(1, 0, 1))
            a11 = L(wz, co(1, 1, 0), co(1, 1, 1))
            a0 = L(wy, a00, a01)
            a1 = L(wy, a10, a11)
            return L(wx, a0, a1)

        def slab_coord(lane, ix):
            """Table lane -> slab coordinate with validity-checked
            dateline unwrap (the +-nxc-column representations land on
            the per-level cyclic margin columns).  Unservable -> exact
            XLA fallback."""
            vend = jnp.minimum(nlv - start, slabS) - 2
            d0 = lane - start

            def okd(x):
                return (x >= 0) & (x <= vend)

            if lon_periodic:
                # east candidate only while it maps into the east
                # margin columns (ix <= 1); west only onto the west
                # margin column (ix == nxc-1)
                dp = d0 + oxl
                dm = d0 - oxl
                okp = okd(dp) & (ix <= 1)
                okm = okd(dm) & (ix >= NXC - 1)
                d = jnp.where(okd(d0), d0,
                              jnp.where(okp, dp,
                                        jnp.where(okm, dm, d0)))
                return d, okd(d0) | okp | okm
            return d0, okd(d0)

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
            lon = lon_ref[0:1, sl]
            lat = lat_ref[0:1, sl]
            p = pp_ref[0:1, sl]
            dtp = dt_ref[0:1, sl]
            wt0 = wt_ref[0:1, sl]

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
                lane, ixv, wx, wy, wz, okl = locate(xlon, xlat, xp)
                d, okd = slab_coord(lane, ixv)
                cv, oks = serve(jnp.where(okd, d, 0))
                oks = oks & okd
                f = trilerp(cv, wx, wy, wz)        # [8, WIN]
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
            lanef, ixf, wxf, wyf, wzf, oklf = locate(nlon, nlat, np_)
            df, okdf = slab_coord(lanef, ixf)
            cvf, oksf = serve(jnp.where(okdf, df, 0))
            oksf = oksf & okdf
            ff = trilerp(cvf, wxf, wyf, wzf)
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
                            r0 = (dy * 4 + dz * 2 + dx) * 8
                            for sn in (0, 1):
                                rr = r0 + comp + 3 * sn
                                val = cvf[rr:rr + 1]
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
            # 8 separate [1, npad] outputs instead of one [8, npad]
            # block: at 100M parcels the monolithic 3 GB buffer plus
            # its fragmentation was the last ~0.6 GB of the HBM OOM;
            # separate rows free independently as consumers finish
            for ref, val in zip(
                    (o0, o1, o2, o3, o4, o5, o6, o7),
                    (nlon, nlat, np_, sigs[0], sigs[1], sigs[2], Tf,
                     okf)):
                ref[0:1, sl] = val * okf


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
    if pack.lat_reg:
        lat0 = pack.latFlat[0, 0]
        dlat = pack.latFlat[0, 1] - pack.latFlat[0, 0]
        iy = jnp.clip(jnp.floor((lat2 - lat0) / dlat)
                      .astype(jnp.int32), 0, pack.ny - 2)
    elif pack.lat_asc:
        iy = jnp.clip(jnp.sum(latv <= lat2[:, None], axis=-1)
                      .astype(jnp.int32) - 1, 0, pack.ny - 2)
    else:
        iy = jnp.clip(jnp.sum(latv > lat2[:, None], axis=-1)
                      .astype(jnp.int32) - 1, 0, pack.ny - 2)
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
    lane = (iz * pack.nxT + ix + 1) * pack.ny + iy
    return lane, wx, wy, wz


def _xla_serve(pack: CellPack, lane):
    """8 corner rows [n, 8] from the row-major mirror, corner order
    (dx,dy,dz) lexicographic (z-major lanes: dy=+1, dx=+ny,
    dz=+nxT*ny)."""
    oz = pack.nxT * pack.ny
    ny = pack.ny
    return [jnp.take(pack.cellR, lane + dx * ny + dy + dz * oz,
                     axis=0)
            for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


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
    pari = jnp.asarray(
        [pack.nxc * pack.ny, pack.npl * pack.nxT * pack.ny],
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
def _launch(cellT, latC, latF, pC, pF, s, pari, parf, xrows,
            nstage, CP, slabS, KW, interpret, pack_static):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (nx, ny, npl, LC, PC, lat_asc, p_asc, lon_periodic,
     cartesian, nxT, nxc, lat_reg) = pack_static
    npad = xrows[0].shape[0]
    nchunk = npad // CP
    GB = CP // (U * WIN)

    def inrow(a):
        # zero-copy [1, npad] view of a padded [npad] array (block
        # sublane 1 is legal because it equals the array dimension)
        return a.reshape(1, npad)

    row_spec = pl.BlockSpec((1, U * WIN),
                            lambda c, g, *_: (c * 0, c * GB + g))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunk, GB),
        in_specs=[row_spec] * 5 + [
            pl.BlockSpec((8, WIN), lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(latC.shape,
                         lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(latF.shape,
                         lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(pC.shape, lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(pF.shape, lambda c, g, *_: (c * 0, c * 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[row_spec] * 8,
        scratch_shapes=[
            pltpu.VMEM((ROWS, slabS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(
        _kernel, GB=GB, slabS=slabS, KW=KW, nstage=nstage, ny=ny,
        npl=npl, LC=LC, PC=PC, lat_asc=lat_asc, p_asc=p_asc,
        lon_periodic=lon_periodic, cartesian=cartesian, nx=nx,
        NXT=nxT, NXC=nxc, lat_reg=lat_reg)
    parfv = jnp.broadcast_to(
        jnp.pad(parf.astype(jnp.float32), (0, 8 - parf.shape[0]))
        [:, None], (8, WIN))
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, npad), jnp.float32)] * 8,
        interpret=interpret,
    )(s, pari, *[inrow(a) for a in xrows], parfv, latC, latF, pC,
      pF, cellT)


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

    def prep(a):
        a = a.astype(jnp.float32)
        if npad != n:   # replicate the last live parcel as padding
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[n - 1:n], (npad - n,))])
        return a

    xrows = [prep(a) for a in (lon, lat, p, dtp, wt0)]

    # slab window starts from the chunk-boundary parcels' lanes
    blane, _, _, _ = _xla_locate(pack, parf, xrows[0][::CP],
                                 xrows[1][::CP], xrows[2][::CP])
    ntotp = pack.cellT.shape[1]
    s = (jnp.clip(blane - 2 * pack.ny - 1024, 0, ntotp - slabS)
         // WIN).astype(jnp.int32)

    pack_static = (pack.nx, pack.ny, pack.npl,
                   -(-pack.ny // 8), -(-pack.npl // 8),
                   pack.lat_asc, pack.p_asc,
                   pack.lon_periodic, pack.cartesian,
                   pack.nxT, pack.nxc, pack.lat_reg)
    out = _launch(pack.cellT, pack.latC, pack.latFlat, pack.pC,
                  pack.pFlat, s, pari, parf, xrows, nstage, CP,
                  slabS, KW, interpret, pack_static)

    rows = [out[r][0, :n] for r in range(7)]
    ok = out[7][0, :n] > 0.5
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
        # overflow abort, mptrac.c:2281).  (A full-ensemble lax.map
        # recompute here both crashes the TPU runtime inside lax.scan
        # and reserves a padded n x 16 f32 HLO temp = 6 GB at 100M.)
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
